"""Straight-through-estimator rounding.

Behavioral parity with the reference ``ste_round`` (reference:
``compressai/ops/ops.py:20-34``): forward computes ``round(x)``, backward
passes the gradient through unchanged (identity Jacobian).

TPU note: implemented as a ``jax.custom_vjp`` so XLA sees a single fused
round in the forward pass and no extra ops in the backward pass (the
``round(x) - detach(x) + x`` trick would materialize two extra tensors).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x):
    """Round with identity (straight-through) gradient."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)
