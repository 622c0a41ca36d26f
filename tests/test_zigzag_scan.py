"""Scanned zigzag AR loop: exact equivalence with the unrolled loop.

The scanned loop (``ZigzagCharmCoder.scan=True``, one ``lax.scan`` with
stacked per-slice weights) must produce EXACTLY the unrolled loop's
y_hat and likelihoods when the unrolled per-slice parameters are
migrated with ``stack_zigzag_params`` — same guarantee WACNN's
``scan_charm`` has (tests/test_scan_charm.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models.zigzag_coder import (
    ZigzagCharmCoder,
    stack_zigzag_params,
    unstack_zigzag_params,
)

pytestmark = pytest.mark.slow

CFG = dict(
    latent_dim=48,
    num_slices=4,
    spatial_number=2,
    max_support=5,
    support_num=7,
    hyper_enc_widths=(48, 40, 32, 24, 16),
    hyper_dec_widths=(24, 32, 40, 48, 48),
    cc_widths=(20, 12),
)


def _code(model, variables, y, method):
    return model.apply(
        variables, y, False, method=method,
        rngs={"noise": jax.random.PRNGKey(9)},
    )


@pytest.mark.parametrize("apply_lrp", [True, False])
def test_scan_equals_unrolled(apply_lrp):
    y = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 48), jnp.float32)

    unrolled = ZigzagCharmCoder(**CFG, apply_lrp=apply_lrp, scan=False)
    v = jax.jit(
        lambda rngs, y: unrolled.init(rngs, y, False, method=unrolled.code)
    )({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, y)
    y_hat_u, lik_u = _code(unrolled, v, y, unrolled.code)

    scanned = ZigzagCharmCoder(**CFG, apply_lrp=apply_lrp, scan=True)
    sc = CFG["latent_dim"] // CFG["num_slices"]
    cond_w = min(CFG["support_num"], unrolled.ctx_slices) * sc
    params = dict(v["params"])
    stacked = stack_zigzag_params(
        params, unrolled.ctx_slices, sc, CFG["max_support"], cond_w,
        apply_lrp=apply_lrp,
    )
    keep = {
        k: p for k, p in params.items()
        if not k.startswith(("cc_mean_", "cc_scale_", "lrp_"))
    }
    sv = {"params": {**keep, **stacked}}
    y_hat_s, lik_s = _code(scanned, sv, y, scanned.code)

    # The scanned first conv is fixed-width (padded support) while the
    # unrolled one is variable-width; XLA reduces the two shapes in
    # different orders, so equality is to float accumulation noise (~1e-7),
    # NOT bitexact. (The real coder never uses the scanned path — both of
    # its sides run the unrolled protocol, so AR bitexactness is
    # unaffected; scan is a training-throughput path.)
    np.testing.assert_allclose(
        np.asarray(y_hat_u), np.asarray(y_hat_s), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lik_u["y"]), np.asarray(lik_s["y"]), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(lik_u["z"]), np.asarray(lik_s["z"])
    )

    # round-trip the migration
    back = unstack_zigzag_params(
        stacked, unrolled.ctx_slices, sc, CFG["max_support"], cond_w,
        apply_lrp=apply_lrp,
    )
    for k, tree in back.items():
        for ln, p in tree.items():
            np.testing.assert_array_equal(
                p["kernel"], np.asarray(params[k][ln]["kernel"])
            )


def test_crc_model_scan_forward():
    """scan_charm plumbs through a CRC model end-to-end."""
    from icm_tpu.models import create_model

    m = create_model(
        "stf9", N=16, M=32, num_slices=4, max_support=3, support_num=5,
        hyper_enc_widths=(32, 28, 24, 20, 16),
        hyper_dec_widths=(20, 24, 28, 32, 32),
        cc_widths=(16, 8), mid=16, scan_charm=True,
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    out = m.apply(v, x, training=False)
    assert np.isfinite(np.asarray(out["machine_likelihoods"]["y"])).all()
