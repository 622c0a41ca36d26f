"""Benchmark: encode+decode throughput of the flagship codec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): images/sec/chip for full encode+decode at
512x512. The reference publishes no numbers (BASELINE.md), so the baseline
is MEASURED here: tools/reference_baseline.py drives the actual reference
model code (torch-CPU, its coder backed by this repo's rANS) on this host
and writes baseline_reference.json; vs_baseline = our img/s divided by the
reference's on that host (methodology note in "extra"). "extra" carries
secondary measurements (jitted eval-forward throughput, bpp).
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: full-size graphs take minutes to compile over
# the remote-TPU tunnel; caching them makes reruns start in seconds
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model", default="cnn",
        help="registry name; any CharmCodec-protocol model (cnn, stf, "
        "stf5-8, ...). Default cnn = flagship WACNN.",
    )
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args(argv)
    size = args.size
    batch = args.batch
    from icm_tpu.models import CharmCodec, create_model
    from icm_tpu.nn import set_use_pallas

    set_use_pallas(None)  # auto: fused kernel where profitable (W<=256)

    model = create_model(args.model)  # cnn: full-size N=192, M=320, 10 slices
    # near-midgray input: an untrained model on white-noise input produces
    # far-out-of-range symbols (6+ bpp of bypass escapes), which benchmarks
    # the coder on a statistically unrealistic stream; low-amplitude input
    # gives in-range symbols comparable to a trained model's (~1 bpp).
    x = 0.5 + 0.08 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, size, size, 3)
    )
    x = jnp.clip(x, 0.0, 1.0)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    jax.block_until_ready(variables)

    # secondary: jitted eval forward throughput, measured as a SERIAL
    # chain (iteration i+1 consumes iteration i's x_hat) inside one
    # lax.scan, anchored by a real device_get of a scalar reduced from
    # the final output. BOTH anchors matter on this remote runtime:
    # block_until_ready returns without waiting for actual execution
    # (async python-loop timings read 98-427k img/s — physically
    # impossible), and only fetching bytes that data-depend on the whole
    # chain forces it to have run.
    FWD_ITERS = 10

    def measure_fwd():
        import jax.lax as lax

        @jax.jit
        def chain(p, x0):
            def body(c, _):
                out = model.apply({"params": p}, c, training=False)
                nxt = jnp.clip(out["x_hat"], 0.0, 1.0).astype(c.dtype)
                return nxt, ()

            final, _ = lax.scan(body, x0, None, length=FWD_ITERS)
            return final.sum()

        float(jax.device_get(chain(variables["params"], x)))  # warm
        t0 = time.time()
        float(jax.device_get(chain(variables["params"], x)))
        return batch * FWD_ITERS / (time.time() - t0)

    fwd_ips = measure_fwd()

    # bf16 activation pipeline (transforms bf16, entropy math f32) — the
    # training-forward fast path; the coder below stays on the f32 policy
    from icm_tpu.nn import set_activation_dtype

    set_activation_dtype(jnp.bfloat16)
    fwd16_ips = measure_fwd()
    set_activation_dtype(None)

    # symmetric stream-group pipelining: decode overlaps one group's
    # device context step with the other's host rANS + link transfers
    # (encoder uses the same grouping so the AR context shapes match
    # bit-for-bit — see CharmCodec.decompress). The AR round-trip chain
    # is per BATCH, not per image, so large batches amortize it: measured
    # sweep (tools/probe_batch.py) peaks at batch 32-48 with 8 groups
    # (17.7-18.5 img/s vs 6.6 at batch 4).
    groups = max(1, min(8, batch // 4))
    codec = CharmCodec(model, variables)

    def sync(a):
        # block_until_ready does not actually wait on this remote
        # runtime; fetching a data-dependent scalar does
        return float(jax.device_get(a.sum()))

    enc = codec.compress(x, pipeline_groups=groups)
    dec = codec.decompress(enc["strings"], enc["shape"], pipeline_groups=groups)
    sync(dec["x_hat"])

    # median-of-iters: the remote-TPU link adds heavy per-run variance
    iters = 5
    enc_ts, dec_ts = [], []
    for _ in range(iters):
        t0 = time.time()
        enc = codec.compress(x, pipeline_groups=groups)
        enc_ts.append(time.time() - t0)
        t0 = time.time()
        dec = codec.decompress(
            enc["strings"], enc["shape"], pipeline_groups=groups
        )
        sync(dec["x_hat"])
        dec_ts.append(time.time() - t0)
    t_enc = float(np.median(enc_ts))
    t_dec = float(np.median(dec_ts))
    ips = batch / (t_enc + t_dec)

    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    bpp = bits / (batch * size * size)

    extra = {
        "batch": batch,
        "model": args.model,
        "bpp_untrained": round(bpp, 3),
        "fwd_images_per_sec": round(fwd_ips, 1),
        "fwd_bf16_images_per_sec": round(fwd16_ips, 1),
        "enc_images_per_sec": round(batch / t_enc, 2),
        "dec_images_per_sec": round(batch / t_dec, 2),
        "backend": jax.default_backend(),
    }
    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_reference.json")
    if args.model != "cnn" or size != 512:
        base_path = ""  # the measured reference baseline is cnn @512 only
    if base_path and os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref_ips = base.get("ref_encdec_img_per_s")
        if ref_ips:
            vs_baseline = round(ips / ref_ips, 2)
            extra["baseline_ref_encdec_img_per_s"] = round(ref_ips, 4)
            extra["baseline_note"] = (
                "reference measured on this host's CPU (torch, actual "
                "reference model code, same 512px input; its prebuilt "
                "GPU-era coder cannot run here) via "
                "tools/reference_baseline.py; same-hardware CPU-vs-CPU "
                f"enc+dec ratio is {base.get('cpu_speedup_encdec', 0):.2f}x"
            )

    print(
        json.dumps(
            {
                "metric": f"images_per_sec_encode_decode_{size}px",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": vs_baseline,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
