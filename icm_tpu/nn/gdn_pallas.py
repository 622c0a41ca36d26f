"""Fused Pallas GDN kernel (VERDICT r4 #8 follow-through).

``tools/probe_gdn.py`` measured XLA's GDN at 2.5x the analytic-minimum
HBM bytes for fwd+bwd (1007 MB vs 403 MB at 8x128x128x192): the square,
normalizer matmul, rsqrt and divide each round-trip an activation-sized
tensor because XLA materializes every dot operand. A rematerializing
``custom_vjp`` alone was proven byte-identical (round-5 BASELINE.md) —
only a real kernel can fuse the elementwise chains INTO the matmul
passes. This module is that kernel.

Where the kernel lives (measured decision, v5e round 5): the FORWARD
stays on XLA's einsum — the fused forward kernel was built and measured
SLOWER on-chip (~175 GB/s vs ~430 GB/s effective: C=192 pads to 256
lanes, taxing the elementwise chain, while XLA's 1.5x-of-minimum
traffic runs at full bandwidth). All of XLA's wasted 600 MB/step is in
the BACKWARD (it materializes x^2, n and dn around three dots), so only
the backward runs in Pallas. Isolated train-step A/B at 8x256x256
WACNN f32: 87.7 -> 91.5 img/s (+4.3%) with this split.

Forward (XLA einsum, inside the custom_vjp so inference paths are
untouched):

    s = x*x;  n = s @ gamma + beta;  y = x * rsqrt(n)   (sqrt if inverse)

Backward kernel (reads x and the cotangent g, writes dx, recomputes n
in VMEM; both backward matmuls — ``dn @ gamma^T`` for dx and
``s^T @ dn`` for dgamma — run in the same pass, with dgamma/dbeta
accumulated across sequential grid steps in a revisited VMEM block):

    r  = n^{-1/2}
    dn = -1/2 * g * x * r^3          (inverse: +1/2 * g * x * r)
    dx = g * r + 2 * x * (dn @ gamma^T)   (inverse: g*n*r + ...)
    dgamma = s^T @ dn;  dbeta = sum_rows(dn)

Reference behavior being fused: ``compressai/layers/gdn.py:26-77`` (the
conv1x1 normalizer); numerics match the einsum path in ``nn/gdn.py`` to
f32 round-off (the kernel computes in f32 regardless of activation
dtype, like XLA's f32 accumulation for the einsum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, *, inverse):
    x = x_ref[...].astype(jnp.float32)
    s = x * x
    n = (
        jax.lax.dot(
            s, gamma_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        + beta_ref[...]
    )
    r = jnp.sqrt(n) if inverse else jax.lax.rsqrt(n)
    y_ref[...] = (x * r).astype(y_ref.dtype)


def _bwd_kernel(
    g_ref, x_ref, gamma_ref, beta_ref, dx_ref, dgamma_ref, dbeta_ref, *, inverse
):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)
    s = x * x
    n = jax.lax.dot(s, gamma, preferred_element_type=jnp.float32) + beta_ref[...]
    r = jax.lax.rsqrt(n)
    if inverse:
        dx_dir = g * (n * r)  # g * sqrt(n)
        dn = 0.5 * g * x * r
    else:
        dx_dir = g * r
        dn = -0.5 * g * x * (r * r * r)
    # ds = dn @ gamma^T  (contract the output-channel axis of both)
    ds = jax.lax.dot_general(
        dn, gamma, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = (dx_dir + 2.0 * x * ds).astype(dx_ref.dtype)
    # dgamma_part = s^T @ dn  (contract the row axis)
    dgamma_part = jax.lax.dot_general(
        s, dn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbeta_part = jnp.sum(dn, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dgamma_ref[...] = dgamma_part
        dbeta_ref[...] = dbeta_part

    @pl.when(i > 0)
    def _acc():
        dgamma_ref[...] += dgamma_part
        dbeta_ref[...] += dbeta_part


def _pick_tile(n_rows: int, channels: int) -> int | None:
    """Largest power-of-two row tile <= 512 dividing n_rows (>= 8 rows so
    the sublane dim tiles cleanly); None -> caller falls back to einsum."""
    t = 512
    while t >= 8:
        if n_rows % t == 0:
            return t
        t //= 2
    return None


def _einsum_fwd(x2d, gamma, beta2d, inverse):
    """XLA forward — numerically identical to nn/gdn.py's einsum path."""
    n = (
        jnp.einsum("nj,ji->ni", (x2d * x2d).astype(gamma.dtype), gamma)
        + beta2d.astype(gamma.dtype)
    )
    r = jnp.sqrt(n) if inverse else jax.lax.rsqrt(n)
    return x2d * r.astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gdn_fused(x2d, gamma, beta2d, inverse, interpret):
    return _einsum_fwd(x2d, gamma, beta2d, inverse)


def _pallas_fwd_impl(x2d, gamma, beta2d, inverse, interpret):
    """The fused forward kernel — kept for tests/probes; measured slower
    than XLA's einsum on v5e (see module docstring), so not the default."""
    n_rows, ch = x2d.shape
    t = _pick_tile(n_rows, ch)
    grid_spec = pl.GridSpec(
        grid=(n_rows // t,),
        in_specs=[
            pl.BlockSpec((t, ch), lambda i: (i, 0)),
            pl.BlockSpec((ch, ch), lambda i: (0, 0)),
            pl.BlockSpec((1, ch), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, ch), lambda i: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((n_rows, ch), x2d.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x2d, gamma, beta2d)


def _gdn_fused_fwd(x2d, gamma, beta2d, inverse, interpret):
    y = _einsum_fwd(x2d, gamma, beta2d, inverse)
    return y, (x2d, gamma, beta2d)


def _gdn_fused_bwd(inverse, interpret, res, g):
    x2d, gamma, beta2d = res
    n_rows, ch = x2d.shape
    t = _pick_tile(n_rows, ch)
    grid_spec = pl.GridSpec(
        grid=(n_rows // t,),
        in_specs=[
            pl.BlockSpec((t, ch), lambda i: (i, 0)),
            pl.BlockSpec((t, ch), lambda i: (i, 0)),
            pl.BlockSpec((ch, ch), lambda i: (0, 0)),
            pl.BlockSpec((1, ch), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t, ch), lambda i: (i, 0)),
            pl.BlockSpec((ch, ch), lambda i: (0, 0)),
            pl.BlockSpec((1, ch), lambda i: (0, 0)),
        ],
    )
    dx, dgamma, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel, inverse=inverse),
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, ch), x2d.dtype),
            jax.ShapeDtypeStruct((ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(g, x2d, gamma, beta2d)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta2d.dtype)


_gdn_fused.defvjp(_gdn_fused_fwd, _gdn_fused_bwd)


def gdn_fused(x, gamma, beta, *, inverse: bool = False, interpret: bool = False):
    """Fused GDN: ``x * (beta + (x*x) @ gamma) ** (+-1/2)``.

    x: (..., C) any leading shape; gamma: (C_in, C_out) in the einsum
    orientation of ``nn/gdn.py``; beta: (C,). Returns None if the
    flattened row count has no power-of-two tile (caller must fall back
    to the einsum path).
    """
    ch = x.shape[-1]
    lead = x.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= d
    if _pick_tile(n_rows, ch) is None:
        return None
    x2d = x.reshape(n_rows, ch)
    y = _gdn_fused(x2d, gamma, beta.reshape(1, ch).astype(jnp.float32),
                   inverse, interpret)
    return y.reshape(*lead, ch)
