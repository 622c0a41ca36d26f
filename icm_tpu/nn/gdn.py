"""Generalized Divisive Normalization, channel-last.

Behavioral parity with the reference ``GDN``/``GDN1`` (reference:
``compressai/layers/gdn.py:26-104``): ``y = x / sqrt(beta + gamma @ x^2)``
(inverse: multiply by sqrt), beta/gamma kept positive via the
NonNegativeParametrizer.

TPU-native design: the reference computes the normalizer with a 1x1 conv
(NCHW). Here x is NHWC and the normalizer is a single (B*H*W, C) x (C, C)
matmul — exactly the MXU's preferred shape — which XLA fuses with the
square, rsqrt and multiply into one kernel. gamma is stored as (C_in,
C_out) so ``norm[..., i] = beta[i] + sum_j gamma[j, i] * x[..., j]^2``,
matching the reference's conv weight orientation gamma.reshape(C, C, 1, 1)
applied to x².
"""

import flax.linen as nn
import jax.numpy as jnp
import jax

from ..ops import NonNegativeParametrizer


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        C = self.channels
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()

        beta = self.param(
            "beta",
            lambda rng, shape: beta_reparam.init(jnp.ones(shape, jnp.float32)),
            (C,),
        )
        gamma = self.param(
            "gamma",
            lambda rng, shape: gamma_reparam.init(
                self.gamma_init * jnp.eye(C, dtype=jnp.float32)
            ),
            (C, C),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)

        from .layers import _pallas_enabled

        if _pallas_enabled():
            # Fused Pallas path: one HBM read of x / one write of y vs
            # XLA's 2.5x-of-minimum traffic (tools/probe_gdn.py); falls
            # through when the row count has no clean tile.
            from .gdn_pallas import gdn_fused

            y = gdn_fused(
                x, gamma.astype(x.dtype), beta, inverse=self.inverse
            )
            if y is not None:
                return y

        norm = self._norm(x, gamma.astype(x.dtype), beta.astype(x.dtype))
        if self.inverse:
            norm = jnp.sqrt(norm)
        else:
            norm = jax.lax.rsqrt(norm)
        return x * norm

    def _norm(self, x, gamma, beta):
        # gamma[j, i]: contribution of input channel j to output channel i
        return jnp.einsum("...j,ji->...i", x * x, gamma) + beta


class GDN1(GDN):
    """Simplified GDN: |x| instead of x², no sqrt (reference gdn.py:79-104)."""

    @nn.compact
    def __call__(self, x):
        C = self.channels
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta",
            lambda rng, shape: beta_reparam.init(jnp.ones(shape, jnp.float32)),
            (C,),
        )
        gamma = self.param(
            "gamma",
            lambda rng, shape: gamma_reparam.init(
                self.gamma_init * jnp.eye(C, dtype=jnp.float32)
            ),
            (C, C),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)
        norm = jnp.einsum(
            "...j,ji->...i", jnp.abs(x), gamma.astype(x.dtype)
        ) + beta.astype(x.dtype)
        if not self.inverse:
            norm = 1.0 / norm
        return x * norm
