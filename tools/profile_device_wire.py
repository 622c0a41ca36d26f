"""Stage-level wall-clock breakdown of the DeviceWireCodec at a given
config — which device programs dominate encode/decompress (the rANS
scans? the context convs? uploads/fetches?).

Usage: python tools/profile_device_wire.py [--size 512] [--batch 32]
       [--lanes 1024] [--narrow 1.0]
Each stage is timed with a data-dependent fetch anchor (block_until_ready
does not wait on the remote runtime — NOTES_ROUND2.md).
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


def t(fn, *args, n=3, **kw):
    """median wall time of fn(*args), anchored by a fetch of its output."""
    outs = fn(*args, **kw)
    sync(jax.tree_util.tree_leaves(outs)[0])  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        outs = fn(*args, **kw)
        sync(jax.tree_util.tree_leaves(outs)[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--narrow", type=float, default=1.0)
    args = p.parse_args()

    from icm_tpu.models import create_model
    from icm_tpu.models.device_codec import DeviceWireCodec
    from icm_tpu.nn import set_use_pallas

    set_use_pallas(None)
    model = create_model("cnn")
    x = jnp.clip(
        0.5
        + 0.08
        * jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, args.size, args.size, 3)
        ),
        0,
        1,
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = DeviceWireCodec(
        model, variables, lanes_per_image=args.lanes, narrow=args.narrow
    )
    v = codec.variables
    report = {"config": vars(args)}

    # ---- encode stages ------------------------------------------------------
    t_fwd, (y, z) = t(codec._analyze, v, x)
    report["analyze_s"] = round(t_fwd, 3)
    pend = codec._compress_dispatch(x)
    sync(pend["sym32s"][-1])
    t0 = time.time()
    pend = codec._compress_dispatch(x)
    sync(pend["sym32s"][-1])
    report["dispatch_chain_s"] = round(time.time() - t0, 3)

    sym32s, idxs = pend["sym32s"], pend["idxs"]
    _, h, w, _ = sym32s[0].shape
    n_l = codec.kit.n_lanes(h, w)
    vals_T = jnp.concatenate([codec.kit.to_lanes(s, n_l) for s in sym32s], 0)
    rows_T = jnp.concatenate(
        [codec.kit.to_lanes(i.astype(jnp.int32), n_l) for i in idxs], 0
    )
    te, (ybuf, ylen, ydest, yraw, yn) = t(codec.kit._encode_y, vals_T, rows_T)
    report["rans_encode_y_s"] = round(te, 3)
    report["y_steps_lanes"] = list(vals_T.shape)
    tez, _ = t(codec.kit._encode_z_fns["entropy_bottleneck"], pend["z_sym"])
    report["rans_encode_z_s"] = round(tez, 3)

    t0 = time.time()
    enc = codec.compress(x)
    report["compress_total_s"] = round(time.time() - t0, 3)
    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    report["bpp"] = round(bits / (args.batch * args.size ** 2), 3)

    # ---- decode stages ------------------------------------------------------
    y_strings, z_strings = enc["strings"]
    t0 = time.time()
    zwords, zoff, zdest, zraw = codec.kit.upload_words(z_strings)
    ywords, yoff, ydest_h, yraw_h = codec.kit.upload_words(y_strings)
    sync(ywords[:8])
    report["upload_s"] = round(time.time() - t0, 3)

    zh, zw = enc["shape"]
    edev = codec.kit.eb_dev["entropy_bottleneck"]
    G = codec.kit._groups(edev)
    n_lz = args.batch * zh * zw * G
    Tz = edev.num_rows // G
    zd, zr = codec.kit.esc_segment(zdest, zraw, 0, Tz * n_lz)
    tz, z_sym = t(
        lambda w, o: codec.kit._decode_z_fns["entropy_bottleneck"](
            w.astype(jnp.int32), o, args.batch, zh, zw, zd, zr
        ),
        zwords, zoff,
    )
    report["rans_decode_z_s"] = round(tz, 3)

    z_hat = codec._z_dequant(v, z_sym)
    state = codec._ctx_prepare(v, z_hat)
    mu, _, index, ms = codec._slice_context(v, 0, state, [])
    sync(index)
    L = args.batch * n_l
    Ts = (index.shape[1] * index.shape[2] // n_l) * index.shape[3]
    yd, yr = codec.kit.esc_segment(ydest_h, yraw_h, 0, Ts * L)
    td, (sym0, rst, rpt) = t(
        lambda w, o: codec.kit._decode_y_slice(
            w.astype(jnp.int32), o, index, n_l, None, None, yd, yr
        ),
        ywords, yoff,
    )
    report["rans_decode_y_slice0_s"] = round(td, 3)
    tstep, _ = t(codec._step, v, 0, state, [], sym0, mu, ms)
    report["context_step_s"] = round(tstep, 3)
    report["n_slices"] = codec.model.ctx_slices

    t0 = time.time()
    dec = codec.decompress(enc["strings"], enc["shape"])
    sync(dec["x_hat"])
    report["decompress_total_s"] = round(time.time() - t0, 3)
    report["backend"] = jax.default_backend()
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
