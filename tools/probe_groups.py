"""Sweep pipeline_groups for the flagship codec at 512px batch 4 (TPU measurement evidence for BASELINE.md)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, jax, jax.numpy as jnp
from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.nn import set_use_pallas
set_use_pallas(None)
model = WACNN()
x = jnp.clip(0.5 + 0.08 * jax.random.normal(jax.random.PRNGKey(0), (4, 512, 512, 3)), 0, 1)
variables = jax.jit(model.init)({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x)
jax.block_until_ready(variables)
codec = CharmCodec(model, variables)
for g in (1, 2, 4):
    enc = codec.compress(x, pipeline_groups=g)
    dec = codec.decompress(enc["strings"], enc["shape"], pipeline_groups=g)
    jax.block_until_ready(dec["x_hat"])
    te = td = 0.0
    for _ in range(3):
        t0 = time.time(); enc = codec.compress(x, pipeline_groups=g); te += time.time() - t0
        t0 = time.time(); dec = codec.decompress(enc["strings"], enc["shape"], pipeline_groups=g)
        jax.block_until_ready(dec["x_hat"]); td += time.time() - t0
    print(json.dumps({"groups": g, "enc_ips": round(12/te,2), "dec_ips": round(12/td,2), "encdec_ips": round(12/(te+td),3)}))
