"""Benchmark: encode+decode throughput of the flagship codec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): images/sec/chip for full encode+decode at
512x512. The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against the reference-defined target workload once a measured
reference number exists — until then it is null.

Run with the default environment (axon TPU). Falls back to CPU if no TPU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    size = 512
    batch = 4
    from icm_tpu.models import CharmCodec, WACNN

    model = WACNN()  # full-size: N=192, M=320, 10 slices
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, size, size, 3))
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CharmCodec(model, variables)

    # warmup (compile everything)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        jax.block_until_ready(dec["x_hat"])
    dt = time.time() - t0
    ips = batch * iters / dt

    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    bpp = bits / (batch * size * size)

    print(
        json.dumps(
            {
                "metric": f"images_per_sec_encode_decode_{size}px",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": None,
                "extra": {
                    "batch": batch,
                    "bpp_untrained": round(bpp, 3),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
