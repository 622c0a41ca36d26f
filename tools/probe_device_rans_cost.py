"""Microbenchmark: where does the device-rANS scan step cost go on TPU?

Variants over the decode-shaped workload (T steps x lanes):
  ew      — scan of pure elementwise uint32 ops (no gathers)
  g1      — + one (lanes,) gather from the 8 MB LUT
  g3      — + freq/low + words gathers
  full    — the real decode_lanes step
  enc     — the real encode_lanes step (scatters + uint32 division)
Also: dispatch-only time for N chained tiny programs (the per-dispatch
overhead of this remote runtime, which serial codec loops pay per stage).

Usage: python tools/probe_device_rans_cost.py [--lanes 32768] [--T 32]
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
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def sync(a):
    return float(jax.device_get(jnp.asarray(a).sum()))


def t(fn, *args, n=5):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=32768)
    p.add_argument("--T", type=int, default=32)
    args = p.parse_args()
    L, T = args.lanes, args.T

    key = jax.random.PRNGKey(0)
    lut = jnp.asarray(
        np.random.randint(0, 100, (64 * 65536,), np.int16)
    )
    fc = jnp.asarray(np.random.randint(1, 1 << 20, (64 * 300,), np.uint32))
    words = jnp.asarray(np.random.randint(0, 65536, (1 << 22,), np.int32))
    rows_T = jnp.asarray(np.random.randint(0, 64, (T, L), np.int32))
    state0 = jnp.full((L,), np.uint32(1 << 20), jnp.uint32)
    ptr0 = jnp.zeros((L,), jnp.int32)
    off = jnp.asarray(np.arange(L, dtype=np.int32) * 64)

    @jax.jit
    def ew(state, rows_T):
        def step(s, r):
            peek = s & 0xFFFF
            s = (s >> 16) * 31 + peek + r.astype(jnp.uint32)
            s = jnp.where(s < (1 << 16), (s << 16) | 7, s)
            return s, peek

        return lax.scan(step, state, rows_T)

    @jax.jit
    def g1(state, rows_T):
        def step(s, r):
            peek = (s & 0xFFFF).astype(jnp.int32)
            sym = lut[r * 65536 + peek].astype(jnp.uint32)
            s = (s >> 16) * 31 + sym
            return s, sym

        return lax.scan(step, state, rows_T)

    @jax.jit
    def g3(carry, rows_T):
        def step(c, r):
            s, p = c
            peek = (s & 0xFFFF).astype(jnp.int32)
            sym = lut[r * 65536 + peek].astype(jnp.int32)
            fcv = fc[r * 300 + sym]
            s = (fcv >> 16) * (s >> 16) + peek.astype(jnp.uint32)
            w = words[off + p].astype(jnp.uint32)
            need = s < (1 << 16)
            s = jnp.where(need, (s << 16) | w, s)
            p = p + need.astype(jnp.int32)
            return (s, p), sym

        return lax.scan(step, carry, rows_T)

    res = {"lanes": L, "T": T, "backend": jax.default_backend()}
    res["ew_ms_per_step"] = round(t(ew, state0, rows_T) / T * 1e3, 3)
    res["g1_ms_per_step"] = round(t(g1, state0, rows_T) / T * 1e3, 3)
    res["g3_ms_per_step"] = round(t(g3, (state0, ptr0), rows_T) / T * 1e3, 3)

    from icm_tpu.coding.device_rans import decode_lanes, encode_lanes
    from icm_tpu.coding.device_rans import build_device_tables
    from icm_tpu.entropy import EntropyTables

    cdf = np.zeros((64, 68), np.int32)
    for r in range(64):
        pmf = np.random.rand(67) + 0.01
        q = np.floor(pmf / pmf.sum() * 65400).astype(np.int64) + 1
        q[-1] = 65536 - q[:-1].sum()
        cdf[r, 1:68] = np.cumsum(q)
    tables = build_device_tables(
        EntropyTables(
            quantized_cdf=cdf,
            cdf_length=np.full(64, 68, np.int32),
            offset=np.zeros(64, np.int32),
        )
    )
    vals = jnp.asarray(np.random.randint(0, 60, (T, L), np.int32))

    @jax.jit
    def enc(v, r):
        return encode_lanes(v, r, tables)

    res["enc_ms_per_step"] = round(t(enc, vals, rows_T) / T * 1e3, 3)
    buf, lens = enc(vals, rows_T)
    from icm_tpu.coding.device_rans import assemble_streams, lane_offsets

    w = assemble_streams(np.asarray(buf), np.asarray(lens))
    o = lane_offsets(np.asarray(lens))

    @jax.jit
    def dec(words, off, rows):
        return decode_lanes(words, off, rows, tables)

    res["dec_ms_per_step"] = round(
        t(dec, jnp.asarray(w.astype(np.int32)), jnp.asarray(o), rows_T)
        / T
        * 1e3,
        3,
    )

    # per-dispatch overhead: chain of K trivial programs
    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8,), jnp.float32)
    sync(tiny(x))
    K = 30
    t0 = time.time()
    y = x
    for _ in range(K):
        y = tiny(y)
    sync(y)
    res["chained_dispatch_ms_each"] = round(
        (time.time() - t0) / K * 1e3, 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
