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
