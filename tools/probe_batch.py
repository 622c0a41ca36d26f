"""Sweep codec batch size / stream groups at 512px - shows the AR round-trip chain amortizing per batch (evidence for the bench batch-32 default)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.nn import set_use_pallas

set_use_pallas(None)
model = WACNN()
for batch, groups in [(32, 16), (48, 8), (24, 8)]:
    x = jnp.clip(0.5 + 0.08 * jax.random.normal(jax.random.PRNGKey(0), (batch, 512, 512, 3)), 0, 1)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x[:1])
    jax.block_until_ready(variables)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x, pipeline_groups=groups)
    dec = codec.decompress(enc["strings"], enc["shape"], pipeline_groups=groups)
    jax.block_until_ready(dec["x_hat"])
    te, td = [], []
    for _ in range(3):
        t0 = time.time(); enc = codec.compress(x, pipeline_groups=groups); te.append(time.time() - t0)
        t0 = time.time(); dec = codec.decompress(enc["strings"], enc["shape"], pipeline_groups=groups)
        jax.block_until_ready(dec["x_hat"]); td.append(time.time() - t0)
    et, dt = float(np.median(te)), float(np.median(td))
    print(json.dumps({"batch": batch, "groups": groups, "enc_ips": round(batch/et, 2),
                      "dec_ips": round(batch/dt, 2), "encdec_ips": round(batch/(et+dt), 3)}), flush=True)
