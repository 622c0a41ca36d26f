"""TPU bench matrix: one measured row per codec family (VERDICT r2 #4, r3 #3).

For every real-coder family that bench.py's CharmCodec path does not
cover (stf2's windowed-token AR, stf3/stf4's masked-transformer decode,
czigzag's conditioned codec, the CRC stacks, the ICM task codecs), build
the model at reference size, run compress -> decompress on the TPU and
record enc/dec img/s + bpp + stream counts. Timing is anchored by a
data-dependent device_get on x_hat (``block_until_ready`` does not wait
on this remote runtime — NOTES_ROUND2.md); encode ends in host rANS
bytes so it is synchronized by construction.

Usage: python tools/bench_matrix.py [--families stf2,stf9,...]
       [--iters 2] [--out BENCH_MATRIX_r03.json]
Rows append to the JSON file as they complete, so a partial run still
records everything it measured.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from eval_model import build_codec  # noqa: E402

# (size, batch) per family: AR-per-token coders (stf2/3/4) decode in
# O(tokens) link round-trips, so they run at 128px; slice-AR families
# run at the 256px config the round-2 rows used.
FAMILIES = {
    "cnn": (256, 4),
    "cnn2": (256, 4),
    "stf": (256, 4),
    "stf2": (128, 4),
    "stf3": (128, 4),
    "stf4": (128, 4),
    "stf5": (256, 4),
    "stf6": (256, 4),
    "stf7": (256, 4),
    "stf8": (256, 4),
    "czigzag": (256, 4),
    "stf9": (256, 4),
    "stf10": (256, 4),
    "stf11": (256, 4),
    "stf12": (256, 4),
    "stf13": (256, 4),
    "stf14": (256, 4),
    "oj_ICM": (256, 4),
    "seg_oj_ICM": (256, 4),
}

# ICM families whose task heads do not participate in the codec path:
# build codec-only so a full-size RetinaNet/DeepLab student is not
# initialized just to time the coder (the wire numbers are identical —
# the task net only consumes x_hat after decode).
_NO_TASK_NET = {"cnn2", "stf10"}


class _Narrowed(Exception):
    """Control-flow marker: codec already rebuilt with narrowing."""


def sync_scalar(a) -> float:
    return float(jax.device_get(jnp.asarray(a).sum()))


def bench_family(
    name: str, size: int, batch: int, iters: int, narrow: float = 1.0,
    wire: str = "host", scan_wire: bool = False,
    checkpoint: str | None = None, model_kwargs: dict | None = None,
) -> dict:
    from icm_tpu.models import create_model

    if scan_wire and name in ("stf2", "stf3", "stf4"):
        # the token-AR device wire already IS the one-program scan
        # design (masked_codec/Stf2ScanWire); there is no separate
        # scan_wire flag for these kinds
        scan_wire = False
    # stf4's real coder needs the causal completion (the reference mask
    # degenerates at token 0 — ClipEncoder4 docstring)
    kwargs = {"causal": True} if name == "stf4" else {}
    if name in _NO_TASK_NET:
        kwargs["with_task_net"] = False
    kwargs.update(model_kwargs or {})
    model = create_model(name, **kwargs)
    # stf5-8: the UNROLLED forward graph overflows the remote compile
    # helper (bench.py) — init the scanned variant; the codec below gets
    # the same weights unstacked back to the per-slice protocol
    from icm_tpu.models.stf_family import ZigzagSwinCodec

    scan_init = isinstance(model, ZigzagSwinCodec)
    if scan_init:
        model = model.clone(scan_charm=True)
    # near-midgray input: in-range symbols comparable to a trained
    # model's statistics (see bench.py)
    key = jax.random.PRNGKey(0)
    x = jnp.clip(
        0.5 + 0.08 * jax.random.normal(key, (batch, size, size, 3)), 0, 1
    )
    init_rngs = {
        "params": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    if name == "czigzag":
        variables = jax.jit(model.init)(init_rngs, x, x)
    else:
        variables = jax.jit(model.init)(init_rngs, x)
    jax.block_until_ready(variables)
    if checkpoint:
        # trained-statistics row: params from a TPU training run (the
        # model_kwargs must match the training parameterization, e.g.
        # {"scan_charm": true} — build_codec descans transparently)
        from icm_tpu.train import TrainState, load_checkpoint, make_optimizer

        state = TrainState.create(variables["params"], make_optimizer())
        state, _ = load_checkpoint(checkpoint, target=state)
        variables = dict(variables)
        variables["params"] = jax.device_put(jax.device_get(state.params))

    if name == "czigzag":
        from icm_tpu.models.crc_codec import CzigzagCodec

        codec = CzigzagCodec(model, variables, narrow=narrow, wire=wire,
                             scan_wire=scan_wire)
        kind = "czigzag"
    else:
        codec, kind = build_codec(
            name, model, variables, wire=wire, scan_wire=scan_wire
        )
        if narrow != 1.0:
            try:  # rebuild with encoder-side narrowing where supported;
                # use the CODEC's model/variables — build_codec descans
                # stf5-8's stacked scan params to the per-slice protocol
                if kind in ("crc", "crc3", "segoj"):
                    wire_kw = {"wire": wire, "scan_wire": scan_wire}
                elif kind == "charm" and wire == "device":
                    wire_kw = {"scan_wire": scan_wire}
                elif kind == "stf2":
                    wire_kw = {"wire": wire}
                elif kind == "masked":
                    # teacher-forced one-shot encoders cannot narrow
                    # per-symbol (context is conditioned on round(y)
                    # itself); latent pre-scaling narrows the symbol
                    # statistics equivalently (masked_codec.py)
                    codec = type(codec)(
                        codec.model, codec.variables, tables=codec.tables,
                        wire=wire, latent_scale=narrow,
                    )
                    raise _Narrowed
                else:
                    wire_kw = {}
                codec = type(codec)(
                    codec.model, codec.variables,
                    tables=codec.tables, narrow=narrow, **wire_kw,
                )
            except _Narrowed:
                pass
            except TypeError:
                narrow = 1.0

    def decompress(enc):
        if kind == "czigzag":
            return codec.decompress(enc["strings"], enc["shape"], x)
        if kind == "crc":
            return codec.decompress(
                enc["strings"], enc["shape"], enc["human_shape"]
            )
        if kind == "crc3":
            return codec.decompress(
                enc["strings"], enc["shape"], enc["seg_shape"],
                enc["human_shape"],
            )
        if kind == "segoj":
            return codec.decompress(
                enc["strings"], enc["shape"], enc["seg_shape"]
            )
        if kind == "stf2":
            return codec.decompress(
                enc["strings"], enc["shape"], enc["out_hw"], enc["lattice"]
            )
        return codec.decompress(enc["strings"], enc["shape"])

    def one_roundtrip():
        t0 = time.time()
        enc = (
            codec.compress(x, x) if kind == "czigzag" else codec.compress(x)
        )
        t_enc = time.time() - t0  # ends in host rANS bytes: synchronized
        t0 = time.time()
        dec = decompress(enc)
        sync_scalar(dec["x_hat"])  # data-dependent fetch anchors the time
        t_dec = time.time() - t0
        bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
        return enc, bits, t_enc, t_dec

    # warm-up doubles as compile
    t_first = time.time()
    enc0, bits, _, _ = one_roundtrip()
    t_first = time.time() - t_first

    encs, decs = [], []
    for _ in range(iters):
        _, bits, te, td = one_roundtrip()
        encs.append(te)
        decs.append(td)
    encs.sort()
    decs.sort()
    te = encs[len(encs) // 2]
    td = decs[len(decs) // 2]
    n_streams = sum(len(ss) for ss in enc0["strings"])
    return {
        "model": name,
        "size": size,
        "batch": batch,
        "narrow": narrow,
        "wire": (
            "device+scan"
            if getattr(codec, "scan_wire", scan_wire) and scan_wire
            else wire
        ),
        "bpp": round(bits / (batch * size * size), 4),
        "enc_images_per_sec": round(batch / te, 3),
        "dec_images_per_sec": round(batch / td, 3),
        "encdec_images_per_sec": round(batch / (te + td), 3),
        "n_streams": n_streams,
        "warmup_s": round(t_first, 1),
        "backend": jax.default_backend(),
        **(
            {"checkpoint": os.path.basename(os.path.normpath(checkpoint)),
             "stats": "trained"}
            if checkpoint else {}
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_MATRIX_r05.json")
    )
    ap.add_argument(
        "--wire", default="host", choices=("host", "device"),
        help="entropy-coding transport (device = DeviceWireKit lanes)",
    )
    ap.add_argument(
        "--narrow", type=float, default=1.0,
        help="encoder residual scaling: <1 gives trained-like symbol "
        "statistics under random init (codec.enc_round; VERDICT r3 #3)",
    )
    ap.add_argument(
        "--scan-wire", action="store_true",
        help="CRC-family kinds: one-lax.scan AR codec (scan_codec.py); "
        "implies --wire device",
    )
    ap.add_argument(
        "--size", type=int, default=None,
        help="override the per-family image size (e.g. 512 for the "
        "north-star resolution rows — VERDICT r4 #7)",
    )
    ap.add_argument(
        "--batch", type=int, default=None,
        help="override the per-family batch size",
    )
    ap.add_argument(
        "--checkpoint", default=None,
        help="orbax training checkpoint: row runs TRAINED statistics "
        "(set --model-kwargs to the training parameterization)",
    )
    ap.add_argument(
        "--model-kwargs", default=None,
        help='JSON dict of model constructor overrides, e.g. '
        '\'{"scan_charm": true}\'',
    )
    ns = ap.parse_args()
    if ns.scan_wire:
        ns.wire = "device"
    wire_tag = "device+scan" if ns.scan_wire else ns.wire
    rows = []
    if os.path.exists(ns.out):
        rows = json.load(open(ns.out))
    done = {
        (r["model"], r.get("wire", "host"), r.get("size"))
        for r in rows
    }
    for name in ns.families.split(","):
        size, batch = FAMILIES[name]
        size = ns.size or size
        batch = ns.batch or batch
        if (name, wire_tag, size) in done:
            print(f"skip {name} (already recorded)", flush=True)
            continue
        try:
            import json as _json

            row = bench_family(
                name, size, batch, ns.iters, ns.narrow, ns.wire,
                ns.scan_wire, checkpoint=ns.checkpoint,
                model_kwargs=_json.loads(ns.model_kwargs)
                if ns.model_kwargs else None,
            )
        except Exception as e:
            row = {"model": name, "error": repr(e)}
        print(json.dumps(row), flush=True)
        rows.append(row)
        json.dump(rows, open(ns.out, "w"), indent=1)


if __name__ == "__main__":
    main()
