"""Lower-bound op with pass-through gradient.

Behavioral parity with the reference ``LowerBound`` (reference:
``compressai/ops/bound_ops.py:21-65``): forward is ``max(x, bound)``;
the gradient passes through when ``x >= bound`` OR when the gradient would
move ``x`` off the bound (``grad_output < 0``, i.e. increasing x under
gradient *descent*), and is zero otherwise. ``bound`` receives no gradient.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0).astype(g.dtype), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


class LowerBound:
    """Callable wrapper holding a static bound value."""

    def __init__(self, bound: float):
        self.bound = float(bound)

    def __call__(self, x):
        return lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))
