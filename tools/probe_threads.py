"""Head-to-head: threaded stream groups vs the explicit round-robin decode (evidence for the pipelining design choice)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.models.pipelining import group_bounds, run_groups, split_strings
from icm_tpu.nn import set_use_pallas

set_use_pallas(None)
model = WACNN()
x = jnp.clip(0.5 + 0.08 * jax.random.normal(jax.random.PRNGKey(0), (4, 512, 512, 3)), 0, 1)
variables = jax.jit(model.init)({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x)
jax.block_until_ready(variables)
codec = CharmCodec(model, variables)

enc = codec.compress(x, pipeline_groups=2)

def dec_roundrobin():
    return codec.decompress(enc["strings"], enc["shape"], pipeline_groups=2)

def dec_threads():
    bounds = group_bounds(4, 2)
    groups = split_strings(enc["strings"], bounds)
    outs = run_groups(lambda g: codec._decompress_group(g[0], g[1], enc["shape"]), [(g,) for g in groups])
    return {"x_hat": jnp.concatenate([o["x_hat"] for o in outs], 0)}

def enc_serialgroups():
    return codec.compress(x, pipeline_groups=2)

def enc_threads():
    bounds = group_bounds(4, 2)
    outs = run_groups(lambda a, b: codec._compress_group(x[a:b]), list(zip(bounds[:-1], bounds[1:])))
    return outs

for name, fn in [("dec_roundrobin", dec_roundrobin), ("dec_threads", dec_threads),
                 ("enc_dispatchfinish", enc_serialgroups), ("enc_threads", enc_threads)]:
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0] if not isinstance(out, list) else out[0]["strings"] is not None or 0)
    ts = []
    for _ in range(5):
        t0 = time.time(); out = fn()
        leaves = [o for o in (jax.tree_util.tree_leaves(out) if not isinstance(out, list) else [])
                  if hasattr(o, "block_until_ready")]
        for l in leaves: l.block_until_ready()
        ts.append(time.time() - t0)
    print(json.dumps({"variant": name, "median_s": round(float(np.median(ts)), 4),
                      "ips": round(4 / float(np.median(ts)), 2)}))
