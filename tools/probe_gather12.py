#!/usr/bin/env python
"""Measured accept/reject for the 12-bit device-wire decode idea
(VERDICT r4 #4).

The v2 device decode spends 2 gathers/symbol (pair-LUT + renorm pull) at
a measured ~95M gathers/s on v5e. The proposal: drop coder precision
16 -> 12 so the pair-LUT shrinks 65536 -> 4096 entries/row (~32 MB ->
2 MB), hoping a VMEM-resident table beats the HBM gather path. This
probe prices the hypothesis directly: the SAME gather pattern as the
decode step (random (row, peek) pair-gather from the LUT inside a
lax.scan, trailing slice of 2) across table sizes spanning
256 KB .. 32 MB. If throughput is flat in table size (round-4 finding:
gather issue rate, not memory traffic, is the bound), precision cuts buy
nothing and the 12-bit wire's ~0.3-0.5% bpp quantization cost buys no
speed — reject.

A Pallas VMEM path was considered and rejected analytically: TPU has no
per-lane vector gather (a VMEM table is gathered by the same scalar
unit), and the MXU one-hot-matmul lookup trick requires all lanes to
share ONE table row — the decode's row index varies per lane (scale
bucket per element), so the one-hot would need rows*4096 width (~262k)
or a 3-way contraction costing ~25 GFLOP/step. Numbers below are the
evidence either way.

Usage: python tools/probe_gather12.py [--lanes 32768] [--steps 64]
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


def sync(a) -> float:
    return float(jax.device_get(jnp.asarray(a).sum()))


def bench_pair_gather(rows: int, entries: int, lanes: int, steps: int,
                      iters: int = 10):
    """The decode step's LUT access: flat (row*entries + peek) pair
    gather, chained through a lax.scan so steps are serial like the real
    decode (each step's peek depends on the previous state)."""
    key = jax.random.PRNGKey(0)
    lut = jax.random.randint(
        key, (rows * entries, 2), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    rows_T = jax.random.randint(
        jax.random.PRNGKey(1), (steps, lanes), 0, rows, dtype=jnp.int32
    )

    @jax.jit
    def run(lut, rows_T, seed):
        def step(state, r):
            peek = (state % entries).astype(jnp.int32)
            e = lut[r * entries + peek]
            # fold the fetch into the next state: serial dependence
            state = state * 1103515245 + e[:, 0] + (e[:, 1] >> 16)
            return state, e[:, 0]

        state0 = jnp.full((lanes,), seed, jnp.uint32)
        _, out = jax.lax.scan(step, state0, rows_T)
        return out

    sync(run(lut, rows_T, jnp.uint32(7)))  # compile+warm
    t0 = time.time()
    for i in range(iters):
        out = run(lut, rows_T, jnp.uint32(i))
    sync(out)
    dt = (time.time() - t0) / iters
    n = steps * lanes
    return {
        "rows": rows,
        "entries_per_row": entries,
        "table_MB": round(rows * entries * 8 / 1e6, 1),
        "gathers_per_s_M": round(n / dt / 1e6, 1),
        "ms_per_step": round(dt / steps * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ns = ap.parse_args()
    for rows, entries in [
        (64, 1 << 12),   # the proposed 12-bit wire: 2 MB
        (64, 1 << 14),   # 14-bit: 8 MB
        (64, 1 << 16),   # the shipped 16-bit wire: 32 MB
        (8, 1 << 12),    # small-row control: 256 KB (VMEM-sized)
    ]:
        row = bench_pair_gather(
            rows, entries, ns.lanes, ns.steps, ns.iters
        )
        row["backend"] = jax.default_backend()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
