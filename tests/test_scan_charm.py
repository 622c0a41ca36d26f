"""Scanned ChARM loop == unrolled reference loop, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from icm_tpu.models import WACNN
from icm_tpu.models.cnn import stack_charm_params
import pytest

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


def test_scan_equals_unrolled():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}

    unrolled = WACNN(**TINY)
    vu = unrolled.init(rngs, x)
    out_u = unrolled.apply(vu, x, training=False)

    scanned = WACNN(**TINY, scan_charm=True)
    vs = scanned.init(rngs, x)

    # migrate: shared transforms copied, cc stacks built with zero padding
    params = dict(vu["params"])
    stacked = stack_charm_params(
        params,
        num_slices=TINY["num_slices"],
        slice_ch=TINY["M"] // TINY["num_slices"],
        max_support=TINY["max_support_slices"],
        cond_width=TINY["hyper_dec_widths"][-1],
    )
    new_params = {
        k: v
        for k, v in params.items()
        if not (k.startswith("cc_mean_") or k.startswith("cc_scale_")
                or k.startswith("lrp_"))
    }
    new_params.update(stacked)
    # structure must match the scanned init
    jax.tree_util.tree_structure(vs["params"])  # sanity
    out_s = scanned.apply({"params": new_params}, x, training=False)

    np.testing.assert_allclose(
        np.asarray(out_s["x_hat"]), np.asarray(out_u["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["likelihoods"]["y"]),
        np.asarray(out_u["likelihoods"]["y"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["likelihoods"]["z"]),
        np.asarray(out_u["likelihoods"]["z"]),
        atol=1e-6,
    )


def test_scan_trains(tmp_path):
    """Gradients flow through the scanned loop."""
    model = WACNN(**TINY, scan_charm=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )

    def loss(p):
        out = model.apply(
            {"params": p}, x, training=True,
            rngs={"noise": jax.random.PRNGKey(3)},
        )
        return jnp.mean((out["x_hat"] - x) ** 2) - jnp.mean(
            jnp.log(out["likelihoods"]["y"])
        )

    g = jax.grad(loss)(v["params"])
    k = g["charm_scan"]["cc_mean"]["Conv_0"]["kernel"]
    assert np.any(np.asarray(k) != 0)


def test_unstack_roundtrip():
    """unrolled -> stacked -> unrolled is identity (with zero padding the
    only lossy part, which carries no information)."""
    from icm_tpu.models.cnn import unstack_charm_params

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}
    unrolled = WACNN(**TINY)
    vu = unrolled.init(rngs, x)
    sc = TINY["M"] // TINY["num_slices"]
    stacked = stack_charm_params(
        dict(vu["params"]), TINY["num_slices"], sc,
        TINY["max_support_slices"], TINY["hyper_dec_widths"][-1],
    )
    back = unstack_charm_params(
        stacked, TINY["num_slices"], sc,
        TINY["max_support_slices"], TINY["hyper_dec_widths"][-1],
    )
    for tag in ("cc_mean", "cc_scale", "lrp"):
        for i in range(TINY["num_slices"]):
            for ln in back[f"{tag}_{i}"]:
                np.testing.assert_array_equal(
                    back[f"{tag}_{i}"][ln]["kernel"],
                    np.asarray(vu["params"][f"{tag}_{i}"][ln]["kernel"]),
                )
