"""Microbenchmark candidate device-rANS optimizations before adopting them.

Variants at decode shape (T, lanes):
  g_big    — one gather/step from the current 8 MB LUT (64 x 65536 int16)
  g_small  — one gather/step from a precision-12 LUT (64 x 4096 int16)
  g_packed — one gather/step from a packed uint32 LUT (sym|freq|low)
  dec_p12  — full decode step at precision 12, packed LUT, NO inline
             escape pulls (side-channel escapes): 2 gathers/step
  enc_once — encode scan emitting (word, flag) as scan outputs + ONE
             compaction scatter at the end (vs in-loop .at[].set)

Usage: python tools/probe_rans_variants.py [--lanes 32768] [--T 320]
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

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass


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
    p.add_argument("--T", type=int, default=320)
    args = p.parse_args()
    L, T = args.lanes, args.T
    key = jax.random.PRNGKey(0)

    rows_T = jnp.asarray(np.random.randint(0, 64, (T, L), np.int32))
    state0 = jnp.asarray(
        np.random.randint(1 << 16, 1 << 31, (L,)).astype(np.uint32)
    )
    ptr0 = jnp.full((L,), 2, jnp.int32)
    words = jnp.asarray(
        np.random.randint(0, 1 << 16, (T * L // 2 + L * 4,), np.int32)
    )
    off = jnp.asarray((np.arange(L) * (T // 2 + 2)).astype(np.int32))

    lut_big = jnp.asarray(np.random.randint(0, 60, (64, 1 << 16), np.int16))
    lut_small = jnp.asarray(np.random.randint(0, 60, (64, 1 << 12), np.int16))
    lut_packed = jnp.asarray(
        np.random.randint(1, 1 << 31, (64, 1 << 12)).astype(np.uint32)
    )

    def gather_scan(lut_flat, width, out_dtype=jnp.int32):
        def f(state, rows_T):
            def step(s, r):
                peek = (s & (width - 1)).astype(jnp.int32)
                v = lut_flat[r * width + peek]
                s = s ^ v.astype(jnp.uint32)
                return s, ()

            return lax.scan(step, state, rows_T)

        return jax.jit(f)

    res = {"lanes": L, "T": T, "backend": jax.default_backend()}
    res["g_big_ms"] = round(
        t(gather_scan(lut_big.reshape(-1), 1 << 16), state0, rows_T)
        / T * 1e3, 3,
    )
    res["g_small_ms"] = round(
        t(gather_scan(lut_small.reshape(-1), 1 << 12), state0, rows_T)
        / T * 1e3, 3,
    )
    res["g_packed_ms"] = round(
        t(gather_scan(lut_packed.reshape(-1), 1 << 12), state0, rows_T)
        / T * 1e3, 3,
    )

    # full precision-12 decode step: packed LUT + word pull, no escapes
    lutf = lut_packed.reshape(-1)

    @jax.jit
    def dec_p12(carry, rows_T):
        def step(c, r):
            s, p = c
            peek = (s & 0xFFF).astype(jnp.int32)
            e = lutf[r * (1 << 12) + peek]
            sym = (e >> 24).astype(jnp.int32)
            f = (e >> 12) & 0xFFF
            clow = e & 0xFFF
            s = f * (s >> 12) + (s & 0xFFF) - clow
            need = s < (1 << 16)
            w = words[off + p].astype(jnp.uint32)
            s = jnp.where(need, (s << 16) | w, s)
            p = p + need.astype(jnp.int32)
            return (s, p), sym

        return lax.scan(step, carry, rows_T)

    res["dec_p12_ms"] = round(t(dec_p12, (state0, ptr0), rows_T) / T * 1e3, 3)

    # encode: scan outputs + one compaction scatter at the end
    freqs = jnp.asarray(
        np.random.randint(1, 1 << 12, (64, 64)).astype(np.uint32)
    ).reshape(-1)

    @jax.jit
    def enc_once(vals_T, rows_T):
        def step(s, xs):
            v, r = xs
            f = freqs[r * 64 + (v & 63)]
            emit = s >= (f << 20)  # ~renorm check, precision-12-flavored
            w = (s & 0xFFFF).astype(jnp.uint16)
            s = jnp.where(emit, s >> 16, s)
            q = s // f
            s = (q << 12) + (s - q * f)
            return s, (w, emit)

        s = jnp.full((L,), np.uint32(1 << 16), jnp.uint32)
        s, (ws, flags) = lax.scan(step, s, (vals_T, rows_T))
        # compact: per-lane positions by exclusive cumsum over steps
        pos = jnp.cumsum(flags.astype(jnp.int32), axis=0) - flags.astype(
            jnp.int32
        )
        maxw = T + 2
        dest = jnp.where(flags, jnp.arange(L)[None, :] * maxw + pos, L * maxw)
        buf = jnp.zeros((L * maxw,), jnp.uint16)
        buf = buf.at[dest.reshape(-1)].set(ws.reshape(-1), mode="drop")
        lens = pos[-1] + flags[-1]
        return buf, lens

    vals_T = jnp.asarray(np.random.randint(0, 60, (T, L), np.int32))
    res["enc_once_ms"] = round(t(enc_once, vals_T, rows_T) / T * 1e3, 3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
