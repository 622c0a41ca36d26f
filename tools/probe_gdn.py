#!/usr/bin/env python
"""Is a fused Pallas GDN worth building? (VERDICT r4 #8)

SURVEY.md §7 planned a fused GDN kernel (x², 1x1 matmul, rsqrt, divide
in one pass); the train step sits at ~58% of the v5e HBM roof. This
probe answers whether XLA already emits a fused GDN or leaves HBM
round-trips on the table, by comparing the compiler-accounted HBM bytes
of the jitted GDN against the analytic minimum:

  forward:  read x + write y (+ params)           = 2*A + P
  fwd+bwd:  read x, write y; bwd reads x, ct, writes dx (+ dgamma/dbeta)
            >= 4*A + 2*P  (x is rematerialized or saved; either way one
            more activation-sized read)

A ratio near 1.0 means XLA fused everything and the kernel would win
nothing; a ratio >> 1 prices the fusion opportunity. Wall-time GB/s is
measured with a data-dependent fetch (block_until_ready does not wait
on this remote runtime — BASELINE.md round-2 note).

Usage: python tools/probe_gdn.py [--batch 8] [--hw 128] [--ch 192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from icm_tpu.nn.gdn import GDN  # noqa: E402
from icm_tpu.utils.roofline import V5E_HBM_BYTES_PER_S, compiled_costs  # noqa: E402


def sync(a) -> float:
    return float(jax.device_get(jnp.asarray(a).sum()))


def measure(fn, *args, iters: int = 20):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled_costs(compiled)
    sync(compiled(*args))  # warm
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    return costs, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--ch", type=int, default=192)
    ap.add_argument("--iters", type=int, default=20)
    ns = ap.parse_args()

    B, HW, C = ns.batch, ns.hw, ns.ch
    mod = GDN(channels=C)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, C), jnp.float32)
    v = mod.init(jax.random.PRNGKey(1), x)
    A = x.size * 4  # activation bytes f32
    P = C * C * 4

    rows = []

    def fwd(v, x):
        return mod.apply(v, x)

    costs, dt = measure(fwd, v, x, iters=ns.iters)
    ideal = 2 * A + P
    rows.append({
        "case": f"fwd f32 {B}x{HW}x{HW}x{C}",
        "compiler_bytes": costs["bytes"] if costs else None,
        "ideal_bytes": ideal,
        "fusion_ratio": round(costs["bytes"] / ideal, 2) if costs else None,
        "wall_ms": round(dt * 1e3, 3),
        "achieved_GBps": round(costs["bytes"] / dt / 1e9, 1) if costs else None,
        "hbm_roof_pct": round(
            100 * costs["bytes"] / dt / V5E_HBM_BYTES_PER_S, 1
        ) if costs else None,
    })

    def fwdbwd(v, x):
        y, vjp = jax.vjp(lambda xx: mod.apply(v, xx), x)
        (dx,) = vjp(jnp.ones_like(y))
        return y.sum() + dx.sum()

    costs, dt = measure(fwdbwd, v, x, iters=ns.iters)
    ideal = 4 * A + 2 * P
    rows.append({
        "case": f"fwd+bwd(x) f32 {B}x{HW}x{HW}x{C}",
        "compiler_bytes": costs["bytes"] if costs else None,
        "ideal_bytes": ideal,
        "fusion_ratio": round(costs["bytes"] / ideal, 2) if costs else None,
        "wall_ms": round(dt * 1e3, 3),
        "achieved_GBps": round(costs["bytes"] / dt / 1e9, 1) if costs else None,
        "hbm_roof_pct": round(
            100 * costs["bytes"] / dt / V5E_HBM_BYTES_PER_S, 1
        ) if costs else None,
    })

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
