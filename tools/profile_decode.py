"""Decode-time breakdown: where does the AR decompress actually spend
wall-clock? (BASELINE.md attributes it to serial device<->host round
trips over the remote-TPU link; this measures that claim.)

Per slice, the decoder must (a) WAIT for + fetch the device-computed
index tensor (a full link round-trip when the device queue is empty),
(b) run host rANS, (c) dispatch the next fused context step. This tool
times each phase separately plus the z-decode prologue and the
synthesize epilogue, and optionally captures a jax.profiler trace.

Usage: python tools/profile_decode.py [--size 512] [--batch 4]
       [--trace /tmp/decode_trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icm_tpu import coding
    from icm_tpu.models import CharmCodec, WACNN
    from icm_tpu.models.codec import _put_symbols
    from icm_tpu.nn import set_use_pallas

    set_use_pallas(None)
    model = WACNN()
    x = jnp.clip(
        0.5 + 0.08 * jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, args.size, args.size, 3)
        ), 0.0, 1.0,
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    jax.block_until_ready(variables)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x)
    # warm every decode-side jit (shapes identical to the timed run)
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])

    def timed_decode():
        """_decompress_group with per-phase timers."""
        t = dict(z=0.0, index_fetch=0.0, rans=0.0, upload_dispatch=0.0,
                 assemble=0.0)
        v = codec.variables
        y_strings, z_strings = enc["strings"]
        t0 = time.time()
        z_hat = codec._decode_z(z_strings, enc["shape"])
        state = codec._ctx_prepare(v, z_hat)
        gt = codec.tables.gaussian
        lut = gt.symbol_lut()
        decoder = coding.BatchRansDecoder(y_strings)
        slices = []
        mu, _, index, mean_support = codec._slice_context(v, 0, state, [])
        t["z"] = time.time() - t0
        for i in range(codec.model.ctx_slices):
            t0 = time.time()
            idx_np = np.asarray(jax.device_get(index))
            t["index_fetch"] += time.time() - t0
            _, sh, sw, sc = idx_np.shape
            t0 = time.time()
            sym = decoder.decode_stream(
                codec._flat(idx_np), gt.quantized_cdf, gt.cdf_length,
                gt.offset, lut=lut,
            )
            sym = codec._unflat(sym, sh, sw, sc)
            t["rans"] += time.time() - t0
            t0 = time.time()
            out = codec._step(
                v, i, state, slices, _put_symbols(sym), mu, mean_support
            )
            slices.append(out[0])
            if len(out) > 1:
                mu, index, mean_support = out[1], out[2], out[3]
            t["upload_dispatch"] += time.time() - t0
        t0 = time.time()
        y_hat, x_hat = codec._assemble_synthesize(v, slices)
        # data-dependent fetch: block_until_ready does not actually wait
        # for execution on the axon remote runtime
        float(jax.device_get(x_hat.sum()))
        t["assemble"] = time.time() - t0
        return t

    if args.trace:
        with jax.profiler.trace(args.trace):
            t = timed_decode()
        print(f"trace written to {args.trace}")
    else:
        t = timed_decode()

    total = sum(t.values())
    rtt_share = (t["index_fetch"] + t["assemble"]) / total
    report = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "size": args.size,
        "slices": codec.model.ctx_slices,
        "total_s": round(total, 3),
        "phases_s": {k: round(v, 4) for k, v in t.items()},
        "phase_share": {k: round(v / total, 3) for k, v in t.items()},
        "note": (
            "index_fetch = blocking wait for the device context step + "
            "device->host copy of the index tensor (one link round-trip "
            "per AR slice when the queue is drained); rans = host rANS; "
            "upload_dispatch = host->device symbol upload + async step "
            "dispatch; assemble = final synthesize + x_hat fetch"
        ),
        "device_or_link_share": round(rtt_share, 3),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
