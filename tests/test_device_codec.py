"""DeviceWireCodec: on-device entropy coding roundtrip.

Contract: decompress(compress(x)) reproduces the encoder's y_hat
BIT-exactly (same invariant as the host-coder CharmCodec — shared float
programs + exact integer coder), and the device wire's rate matches the
host coder's within the per-lane flush overhead.
"""

import jax
import numpy as np
import pytest

from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.models.device_codec import DeviceWireCodec

pytestmark = pytest.mark.slow

TINY = dict(
    N=16,
    M=24,
    num_slices=6,
    max_support_slices=5,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(12, 14, 16, 20, 24),
    cc_widths=(16, 12, 10, 8),
)


@pytest.fixture(scope="module")
def setup():
    model = WACNN(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    return model, variables, x


def test_roundtrip_bitexact(setup):
    model, variables, x = setup
    codec = DeviceWireCodec(model, variables, lanes_per_image=4)
    enc = codec.compress(x, return_debug=True)
    assert len(enc["strings"][0]) == 2 and len(enc["strings"][1]) == 2
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    arr = np.asarray(dec["x_hat"])
    assert arr.shape == x.shape and arr.min() >= 0.0 and arr.max() <= 1.0


def test_rate_close_to_host_coder(setup):
    """Same model, same tables: device-wire bytes ~ host-wire bytes plus
    per-lane flush/header overhead (bounded, accounted)."""
    model, variables, x = setup
    dev = DeviceWireCodec(model, variables, lanes_per_image=4)
    host = CharmCodec(model, variables, tables=dev.tables)
    e_dev = dev.compress(x)
    e_host = host.compress(x)
    dev_bits = sum(len(s) * 8 for ss in e_dev["strings"] for s in ss)
    host_bits = sum(len(s) * 8 for ss in e_host["strings"] for s in ss)
    B = x.shape[0]
    # overhead bound: 4B flush + 4B header-length per lane + 8B header,
    # for y (4 lanes) + z (zh*zw lanes) per image, on both streams
    zh = zw = x.shape[1] // 64 * 4  # 64px -> z 4x4
    lanes = 4 + zh * zw
    bound = B * (lanes * 8 + 16) * 8
    assert dev_bits < host_bits * 1.02 + bound
    assert dev_bits > host_bits * 0.7  # and it actually compresses


def test_wire_header_parses(setup):
    """Per-image wires are self-describing (lanes, word and escape
    counts); escape dests are in-grid and step-major sorted."""
    from icm_tpu.models.device_codec import _unpack_wire

    model, variables, x = setup
    codec = DeviceWireCodec(model, variables, lanes_per_image=4)
    enc = codec.compress(x)
    for blob in enc["strings"][0]:
        lengths, words, dest, raw = _unpack_wire(blob)
        assert lengths.shape[0] == 4
        assert int(lengths.sum()) == words.shape[0]
        assert (lengths >= 2).all()
        assert dest.shape == raw.shape
        assert (np.diff(dest) > 0).all()  # strictly increasing positions


def test_scan_wire_roundtrip_cnn(setup):
    """WACNN over the SCAN wire (CharmScanWire: the whole prefix-support
    ChARM chain as one lax.scan shared by encoder/decoder): bitexact
    roundtrip, and the scan context agrees with the per-slice protocol
    up to float-accumulation noise (same distributional check as
    tests/test_crc.py::test_crc_codec_scan_wire_roundtrip)."""
    model, variables, x = setup
    scan = DeviceWireCodec(
        model, variables, lanes_per_image=4, scan_wire=True
    )
    enc = scan.compress(x, return_debug=True)
    dec = scan.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["x_hat"]), np.asarray(enc["x_hat"])
    )

    host = CharmCodec(model, variables, tables=scan.tables)
    henc = host.compress(x, return_debug=True)
    d = np.abs(np.asarray(enc["y_hat"]) - np.asarray(henc["y_hat"]))
    assert np.mean(d > 1e-2) < 0.005, np.mean(d > 1e-2)
    assert np.median(d) < 1e-4


def test_scan_wire_roundtrip_stf():
    """stf (Swin flagship, 12 slices, prefix support 6) over the scan
    wire."""
    from icm_tpu.models import SymmetricalTransFormer

    model = SymmetricalTransFormer(
        embed_dim=8,
        depths=(1, 1, 2, 1),
        num_heads=(1, 2, 4, 8),
        window_size=4,
        patch_size=2,
        num_slices=4,
        drop_path_rate=0.1,
        hyper_enc_widths=(64, 56, 48, 40, 32),
        hyper_dec_widths=(40, 48, 56, 64, 64),
        cc_widths=(24, 20, 16, 12),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {
            "params": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3),
        },
        x,
    )
    scan = DeviceWireCodec(
        model, variables, lanes_per_image=4, scan_wire=True
    )
    enc = scan.compress(x, return_debug=True)
    dec = scan.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )


def test_scan_wire_escape_tier_ladder(setup):
    """Escape-heavy streams bump the scan wire's static escape-cap tier
    (models/scan_codec.py): the encoder re-runs at the smallest
    sufficient tier, stamps it on the wire, and the decoder rebuilds the
    SAME program signature from the tier byte — so both sides keep
    executing one executable and the roundtrip stays bitexact even when
    most symbols bypass the coder."""
    from icm_tpu.models.scan_codec import _esc_tier_cap

    model, variables, _ = setup
    # wild out-of-range input on untrained weights: ~1/3 of symbols
    # escape; 128px makes the segment (512 syms) large enough that the
    # tier-0 cap (max(64, seg/64)) cannot hold them
    x = 40.0 * jax.random.normal(jax.random.PRNGKey(7), (2, 128, 128, 3))
    scan = DeviceWireCodec(
        model, variables, lanes_per_image=4, scan_wire=True
    )
    enc = scan.compress(x, return_debug=True)
    tiers = {blob[4] for blob in enc["strings"][0]}  # magic+fmt, then tier
    assert len(tiers) == 1, tiers
    tier = tiers.pop()
    assert tier > 0, "input did not stress the escape channel"
    # the wire's escape counts must fit the stamped tier's cap
    from icm_tpu.models.device_codec import WIRE_SCAN, _unpack_wire

    h = w = 128 // 16
    n_l = 4
    seg = (h * w // n_l) * (model.M // model.ctx_slices) * 2 * n_l
    for blob in enc["strings"][0]:
        _, _, dest, _ = _unpack_wire(blob, WIRE_SCAN, skip=1)
        assert dest.shape[0] <= model.ctx_slices * _esc_tier_cap(seg, tier)
    dec = scan.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )


def test_scan_wire_rejects_sliding_support():
    """oj_ICM-style models (sliding support, windowed conditioning) must
    not silently ride the prefix-support scan program."""
    from icm_tpu.models import create_model

    model = create_model(
        "oj_ICM", with_task_net=False, N=16, M=24, mid=32, num_slices=2,
        max_support=4, support_num=8,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(14, 16, 20, 24, 24),
        cc_widths=(20, 12),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    with pytest.raises(ValueError):
        DeviceWireCodec(model, variables, scan_wire=True)
