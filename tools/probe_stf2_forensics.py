"""Localize the stf2 jax-vs-torch residual (VERDICT r3 #6 follow-up).

The eps-control (probe_stf2_control.py) showed the reference stf2 forward
produces ZERO rounding flips under 3e-3 mu noise, while the live
jax-vs-torch comparison flips ~8e-5 of positions (probe_parity stf2) —
so the cross-framework deviation must locally exceed 3e-3 somewhere,
which "reassociation noise" cannot explain. This probe compares the
autoregressive context TRAJECTORIES directly:

  torch side: forward hooks on muContextModel / cc_mean_transforms
  jax side:   flax capture_intermediates on the same forward

and reports per-AR-step max|context_mu| / max|mu| deviations, separating
  (a) step-0 deviation      -> static wiring/numeric difference
  (b) growth across steps   -> quantized-feedback divergence (flips)

Usage: python tools/probe_stf2_forensics.py [--size 64] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.pop("PALLAS_AXON_POOL_IPS", None) is not None and (
    __name__ == "__main__"
):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable] + sys.argv)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def run(size: int = 64, seed: int = 1, steps: int | None = None) -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    import torch

    from probe_parity import build_reference

    import jax.numpy as jnp

    from icm_tpu.models import create_model
    from icm_tpu.zoo import convert_reference_state_dict

    ref, sd = build_reference("stf2")
    params = convert_reference_state_dict("stf2", sd)
    variables = params if set(params) == {"params"} else {"params": params}

    rng = np.random.RandomState(seed)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # --- torch trajectory ---------------------------------------------------
    t_ctx_mu, t_mu, t_yhat = [], [], []

    def grab(store):
        def hook(_m, _inp, out):
            store.append(out.detach().numpy().copy())

        return hook

    hooks = [
        ref.muContextModel.register_forward_hook(grab(t_ctx_mu)),
        ref.cc_mean_transforms.register_forward_hook(grab(t_mu)),
        ref.lrp_transforms.register_forward_hook(grab(t_yhat)),
    ]
    with torch.no_grad():
        ref(xt)
    for h in hooks:
        h.remove()

    # --- jax trajectory -------------------------------------------------------
    model = create_model("stf2")
    _, inter = model.apply(
        variables,
        jnp.asarray(x),
        training=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    flat = inter["intermediates"]
    j_ctx_mu = [np.asarray(o) for o in flat["muContextModel"]["__call__"]]
    j_mu = [np.asarray(o) for o in flat["cc_mean_head"]["__call__"]]

    n = min(len(t_ctx_mu), len(j_ctx_mu))
    if steps:
        n = min(n, steps)
    report = {"size": size, "n_steps_compared": n, "steps": []}
    for i in range(n):
        tc = t_ctx_mu[i]  # (B, 2s, D) token layout — identical both sides
        jc = j_ctx_mu[i]
        d_ctx = float(np.abs(tc - jc).max()) if tc.shape == jc.shape else None
        tm = np.transpose(t_mu[i], (0, 2, 3, 1))  # NCHW -> NHWC
        jm = j_mu[i]
        d_mu = float(np.abs(tm - jm).max()) if tm.shape == jm.shape else None
        report["steps"].append(
            {
                "i": i,
                "d_ctx_mu": d_ctx,
                "d_mu": d_mu,
                "ctx_shape_t": list(tc.shape),
                "ctx_shape_j": list(jc.shape),
            }
        )
    report["max_d_mu"] = max(
        (s["d_mu"] or 0.0) for s in report["steps"]
    )
    report["step0_d_mu"] = report["steps"][0]["d_mu"]
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)
    rep = run(args.size, args.seed, args.steps or None)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
