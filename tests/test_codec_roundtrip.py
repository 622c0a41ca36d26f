"""Round-trip tests: compress() -> decompress() bitexact reconstruction
(SURVEY.md §4.2 — the AR decoder only works if encoder/decoder context
states match exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.train import RateDistortionLoss, compute_bpp

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
def codec():
    model = WACNN(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    return CharmCodec(model, variables), model, variables, x


def test_roundtrip_bitexact_y_hat(codec):
    c, model, variables, x = codec
    enc = c.compress(x, return_debug=True)
    assert len(enc["strings"]) == 2
    assert len(enc["strings"][0]) == 2 and len(enc["strings"][1]) == 2
    dec = c.decompress(enc["strings"], enc["shape"])
    # decoder reconstructs the encoder's y_hat exactly
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape
    arr = np.asarray(dec["x_hat"])
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_actual_bpp_close_to_estimate(codec):
    """Real-coder bpp ~ entropy-estimate bpp (eval mode), within the
    CDF-quantization/tail tolerance."""
    c, model, variables, x = codec
    enc = c.compress(x)
    B, H, W, _ = x.shape
    actual_bits = sum(len(s) * 8 for s in enc["strings"][0]) + sum(
        len(s) * 8 for s in enc["strings"][1]
    )
    actual_bpp = actual_bits / (B * H * W)

    out = model.apply(variables, x, training=False)
    est_bpp = float(compute_bpp(out["likelihoods"], B * H * W))
    # untrained model → high bpp; both should be same ballpark
    assert actual_bpp == pytest.approx(est_bpp, rel=0.15), (actual_bpp, est_bpp)


def test_pipelined_roundtrip_bitexact(codec):
    """Software-pipelined codec (stream groups overlap host rANS with
    device context steps): encode and decode with the SAME grouping must
    reproduce the encoder's y_hat bit-for-bit, and the reconstruction
    must match the serial codec's closely (grouping changes the XLA
    batch shape, so floats may differ at the ulp level across configs)."""
    c, model, variables, x = codec
    enc = c.compress(x, return_debug=True, pipeline_groups=2)
    dec = c.decompress(enc["strings"], enc["shape"], pipeline_groups=2)
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )

    enc1 = c.compress(x)
    dec1 = c.decompress(enc1["strings"], enc1["shape"])
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(dec1["x_hat"]), atol=1e-5
    )


def test_decompress_matches_eval_forward_xhat(codec):
    """Eval-mode forward x_hat (STE dequantize path) should equal the real
    coder x_hat up to LRP/STE equivalence: both quantize y to the same grid."""
    c, model, variables, x = codec
    enc = c.compress(x, return_debug=True)
    dec = c.decompress(enc["strings"], enc["shape"])
    out = model.apply(variables, x, training=False)
    # not bit-identical (forward applies noise-free STE with the same mu) —
    # but reconstructions should be very close
    a = np.asarray(dec["x_hat"])
    b = np.clip(np.asarray(out["x_hat"]), 0, 1)
    assert np.mean((a - b) ** 2) < 1e-3


def test_pack_unpack_wire_inverse():
    """Device pack -> host unpack reproduces symbols/indexes exactly,
    across escape rates (incl. >12.5%, the raw-fallback threshold) and
    non-multiple-of-4 lengths."""
    import numpy as np
    from icm_tpu.models import WACNN
    from icm_tpu.models.codec import CharmCodec, _unpack_wire

    model = WACNN(
        N=16, M=24, num_slices=6, max_support_slices=5,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(12, 14, 16, 20, 24),
        cc_widths=(16, 12, 10, 8),
    )
    x0 = jnp.zeros((1, 64, 64, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x0
    )
    codec = CharmCodec(model, v)
    rng = np.random.RandomState(0)
    for sigma in (0.6, 2.5):  # ~3% and ~45% escape rates
        sym16s = [
            jnp.asarray(
                np.clip(np.round(rng.normal(0, sigma, (2, 3, 5, 4))),
                        -127, 127).astype(np.int8)
            )
            for _ in range(3)
        ]
        idxs = [
            jnp.asarray(rng.randint(0, 64, (2, 3, 5, 4)).astype(np.uint8))
            for _ in range(3)
        ]
        sym2, idx6, n_esc, esc_buf = codec._pack_streams(sym16s, idxs)
        n_total = sum(int(np.prod(s.shape[1:])) for s in sym16s)
        mx = int(np.max(np.asarray(n_esc)))
        esc = (
            np.asarray(esc_buf[:, :mx]) if mx else np.zeros((2, 0), np.int8)
        )
        symbols, indexes = _unpack_wire(
            np.asarray(sym2), np.asarray(idx6), np.asarray(n_esc), esc,
            n_total,
        )
        want_sym = np.concatenate(
            [np.asarray(s).reshape(2, -1).astype(np.int32) for s in sym16s],
            axis=1,
        )
        want_idx = np.concatenate(
            [np.asarray(i).reshape(2, -1).astype(np.int32) for i in idxs],
            axis=1,
        )
        np.testing.assert_array_equal(symbols, want_sym)
        np.testing.assert_array_equal(indexes, want_idx)


def test_roundtrip_packed_wire_branch():
    """Bitexact roundtrip through the PACKED bulk-fetch branch (narrow
    symbols, escape rate below the 12.5% adaptive threshold) — the other
    roundtrip tests exercise the raw-fallback branch (random-init models
    on broad input make ~40% escapes)."""
    import numpy as np
    from icm_tpu.models import WACNN
    from icm_tpu.models.codec import CharmCodec

    model = WACNN(
        N=16, M=24, num_slices=6, max_support_slices=5,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(12, 14, 16, 20, 24),
        cc_widths=(16, 12, 10, 8),
    )
    # near-constant input -> residual symbols concentrate at 0
    x = jnp.asarray(
        0.5 + 0.002 * np.random.RandomState(0).randn(2, 64, 64, 3)
    ).astype(jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    codec = CharmCodec(model, v)

    # confirm this input actually selects the packed branch
    pend = codec._compress_dispatch(x)
    n_esc = np.asarray(pend["packed"][2])
    n_total = sum(int(np.prod(s.shape[1:])) for s in pend["sym16s"])
    assert int(n_esc.max()) <= n_total // 8, (
        f"escape rate {n_esc.max()}/{n_total} too high to cover the "
        "packed branch"
    )

    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
