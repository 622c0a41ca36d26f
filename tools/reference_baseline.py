"""Measure the reference's performance on this host (the missing baseline).

The reference publishes no numbers (BASELINE.md) and its prebuilt py3.8
native modules cannot import here, so this drives the ACTUAL reference
model code (via icm_tpu.utils.reference_bridge, coder backed by this
repo's rANS) under torch-CPU, and this framework on the SAME hardware,
SAME converted weights and SAME input:

  - eval forward (entropy-estimation path, reference
    ``eval_model/__main__.py:142-247`` semantics),
  - real-coder compress()/decompress() (reference ``cnn.py:210-332``).

Writes ``baseline_reference.json`` at the repo root; ``bench.py`` reads
it to fill ``vs_baseline``. Run with:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/reference_baseline.py
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(size=512, iters=2):
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    from icm_tpu.utils.reference_bridge import ref_wacnn
    from icm_tpu.zoo import convert_wacnn_checkpoint, import_reference_tables

    torch.manual_seed(0)
    ref = ref_wacnn()
    # midgray +/- noise input: in-range symbols, ~trained-stream statistics
    # (same distribution bench.py uses)
    rng = np.random.RandomState(0)
    x_np = np.clip(
        0.5 + 0.08 * rng.standard_normal((1, size, size, 3)), 0, 1
    ).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))

    results = {"size": size, "batch": 1, "host": f"{os.cpu_count()}-core CPU",
               "torch": torch.__version__}

    with torch.no_grad():
        out = ref(xt)  # warm
        t0 = time.time()
        for _ in range(iters):
            out = ref(xt)
        results["ref_fwd_s"] = (time.time() - t0) / iters
        bpp = 0.0
        for v in out["likelihoods"].values():
            bpp += float((-torch.log2(v)).sum()) / (size * size)
        results["ref_bpp_est"] = bpp

        ref.update(force=True)
        enc = ref.compress(xt)  # warm
        t0 = time.time()
        for _ in range(iters):
            enc = ref.compress(xt)
        results["ref_enc_s"] = (time.time() - t0) / iters
        dec = ref.decompress(enc["strings"], enc["shape"])
        t0 = time.time()
        for _ in range(iters):
            dec = ref.decompress(enc["strings"], enc["shape"])
        results["ref_dec_s"] = (time.time() - t0) / iters
        results["ref_bpp_real"] = (
            sum(len(s[0]) for s in enc["strings"]) * 8 / (size * size)
        )
    results["ref_encdec_img_per_s"] = 1.0 / (
        results["ref_enc_s"] + results["ref_dec_s"]
    )

    # ---- this framework, same hardware, same weights, same input ----------
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    del ref
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", "run with JAX_PLATFORMS=cpu"
    from icm_tpu.models import WACNN
    from icm_tpu.models.codec import CharmCodec

    params = convert_wacnn_checkpoint(sd)
    tables = import_reference_tables(sd)
    model = WACNN()
    x = jnp.asarray(x_np)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    out = fwd(params, x)
    jax.block_until_ready(out["x_hat"])
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, x)
    jax.block_until_ready(out["x_hat"])
    results["ours_cpu_fwd_s"] = (time.time() - t0) / iters
    bpp = 0.0
    for v in out["likelihoods"].values():
        bpp += float((-jnp.log2(v)).sum()) / (size * size)
    results["ours_bpp_est"] = bpp

    codec = CharmCodec(model, {"params": params}, tables=tables)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])
    t0 = time.time()
    for _ in range(iters):
        enc = codec.compress(x)
    results["ours_cpu_enc_s"] = (time.time() - t0) / iters
    t0 = time.time()
    for _ in range(iters):
        dec = codec.decompress(enc["strings"], enc["shape"])
        jax.block_until_ready(dec["x_hat"])
    results["ours_cpu_dec_s"] = (time.time() - t0) / iters
    results["ours_bpp_real"] = (
        sum(len(s) for ss in enc["strings"] for s in ss) * 8 / (size * size)
    )
    results["ours_cpu_encdec_img_per_s"] = 1.0 / (
        results["ours_cpu_enc_s"] + results["ours_cpu_dec_s"]
    )
    results["cpu_speedup_encdec"] = (
        results["ours_cpu_encdec_img_per_s"] / results["ref_encdec_img_per_s"]
    )
    results["cpu_speedup_fwd"] = results["ref_fwd_s"] / results["ours_cpu_fwd_s"]

    path = os.path.join(ROOT, "baseline_reference.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
