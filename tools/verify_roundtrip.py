"""At-scale roundtrip verifier: bitexact y_hat across a real wire.

The unit suite proves roundtrips on tiny CPU configs; this tool proves the
SAME property at production scale on the real backend, where the decode-side
program signatures (word-bucket count, escape caps) can differ from the
encode-side dummies. The scan wire's correctness rests on encoder and
decoder executing the same compiled executable (models/scan_codec.py
docstring); a signature divergence would compile the float context twice,
and two compilations of the same math are not guaranteed bit-identical
(NOTES_ROUND4.md, stf3/4 draft desync). This tool is the measurement that
turns that invariant from "asserted" into "verified at scale".

Usage: python tools/verify_roundtrip.py --model cnn --size 512 --batch 32 \
           [--wire device] [--scan-wire] [--narrow 1.0]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cnn")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--wire", choices=("host", "device"), default="device")
    p.add_argument("--scan-wire", action="store_true")
    p.add_argument("--narrow", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from eval_model import build_codec
    from icm_tpu.models import create_model

    t0 = time.time()
    model = create_model(args.model)
    x = 0.5 + 0.08 * jax.random.normal(
        jax.random.PRNGKey(args.seed), (args.batch, args.size, args.size, 3)
    )
    x = jnp.clip(x, 0.0, 1.0)
    init_rngs = {"params": jax.random.PRNGKey(1),
                 "noise": jax.random.PRNGKey(2)}
    if args.model == "czigzag":
        variables = jax.jit(model.init)(init_rngs, x, x)
    else:
        variables = jax.jit(model.init)(init_rngs, x)
    jax.block_until_ready(variables)
    print(f"init done ({time.time() - t0:.0f}s)", file=sys.stderr)

    codec, kind = build_codec(
        args.model, model, variables, wire=args.wire,
        scan_wire=args.scan_wire,
    )
    if args.narrow != 1.0:
        if kind in ("crc", "crc3", "segoj", "czigzag"):
            wire_kw = {"wire": args.wire, "scan_wire": args.scan_wire}
        elif kind == "charm" and args.wire == "device":
            wire_kw = {"scan_wire": args.scan_wire}
        else:
            wire_kw = {}
        codec = type(codec)(
            codec.model, codec.variables, tables=codec.tables,
            narrow=args.narrow, **wire_kw,
        )

    if kind == "czigzag":
        enc = codec.compress(x, x, return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"], x)
    elif kind == "crc":
        enc = codec.compress(x, return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"],
                               enc["human_shape"])
    elif kind == "crc3":
        enc = codec.compress(x, return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"],
                               enc["seg_shape"], enc["human_shape"])
    elif kind == "segoj":
        enc = codec.compress(x, return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"],
                               enc["seg_shape"])
    else:
        enc = codec.compress(x, return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"])
    print(f"roundtrip done ({time.time() - t0:.0f}s)", file=sys.stderr)

    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    bpp = bits / (args.batch * args.size * args.size)
    ok = True
    checked = []
    for key in ("y_hat", "seg_y_hat"):
        if key not in enc or key not in dec:
            continue
        a = np.asarray(jax.device_get(enc[key]))
        b = np.asarray(jax.device_get(dec[key]))
        exact = bool(np.array_equal(a, b))
        ok = ok and exact
        checked.append(key)
        n_bad = int((a != b).sum())
        print(
            f"{key}: bitexact={exact}"
            + ("" if exact else
               f"  mismatched={n_bad}/{a.size}"
               f"  max|d|={np.abs(a - b).max():.3g}")
        )
    if not checked:
        ok = False
        print("no y_hat surfaced by compress(return_debug=True) — "
              "nothing verified")
    if "x_hat" in enc and "x_hat" in dec:
        a = np.asarray(jax.device_get(jnp.clip(enc["x_hat"], 0, 1)))
        b = np.asarray(jax.device_get(dec["x_hat"]))
        print(f"x_hat: max|d|={np.abs(a - b).max():.3g}")
    print(
        f"model={args.model} wire="
        f"{'device+scan' if args.scan_wire else args.wire} "
        f"size={args.size} batch={args.batch} narrow={args.narrow} "
        f"bpp={bpp:.3f} -> {'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
