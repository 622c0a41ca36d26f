"""Train-step throughput, f32 vs bf16 activations (honest timing: the
step chains state -> state inside one jit per call; median of timed
calls, each synced by fetching the loss scalar)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from icm_tpu.models import WACNN
from icm_tpu.nn import set_activation_dtype, set_use_pallas
from icm_tpu.train import RateDistortionLoss
from icm_tpu.train.optim import TrainState, make_optimizer
from icm_tpu.train.steps import make_train_step

set_use_pallas(None)
batch, size = 8, 256
model = WACNN(scan_charm=True)  # full-size N=192 M=320
x = jnp.clip(0.5 + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3)), 0, 1)
variables = jax.jit(model.init)({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x)
jax.block_until_ready(variables)

for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
    set_activation_dtype(dt)
    # fresh param buffers per variant: the donated step consumes them
    params0 = jax.tree_util.tree_map(lambda a: a.copy(), variables["params"])
    state = TrainState.create(params0, make_optimizer())
    step = jax.jit(make_train_step(model, RateDistortionLoss(0.01)), donate_argnums=(0,))
    rng = jax.random.PRNGKey(3)
    state, m = step(state, x, rng)
    float(jax.device_get(m["loss"]))  # warm + sync
    ts = []
    for _ in range(5):
        t0 = time.time()
        state, m = step(state, x, rng)
        float(jax.device_get(m["loss"]))
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    row = {"variant": name, "step_s": round(med, 4),
           "train_img_per_s": round(batch / med, 1)}
    try:  # train-step MFU/HBM roofline from compiled cost analysis
        from icm_tpu.utils.roofline import RooflineReport, costs_of

        costs = costs_of(step, state, x, rng)
        if costs:
            row["roofline"] = RooflineReport(
                costs["flops"], costs["bytes"], med,
                dtype=("bfloat16" if dt is not None else "float32"),
                on_tpu=jax.default_backend() not in ("cpu",),
            ).summary(per=batch)
    except Exception as e:  # pricing must never break the measurement
        row["roofline_error"] = str(e)[:80]
    print(json.dumps(row), flush=True)
set_activation_dtype(None)
