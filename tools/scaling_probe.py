"""Print the multi-device scaling quantities tests/test_scaling.py
asserts, as one JSON table for BASELINE.md.

On the virtual CPU mesh wall-clock cannot demonstrate ICI scaling (all
"devices" share one host), so the compiler-accounted curve is the honest
measurable: XLA SPMD compiles one per-device module whose cost_analysis
FLOPs must shrink ~1/N at fixed global batch, while the loss and the
sharded codec's streams stay invariant to mesh size.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402


def main():
    import numpy as np

    import test_scaling as ts
    from icm_tpu.utils.roofline import compiled_costs

    model, variables, x = ts._setup()
    out = {"global_batch": ts.GLOBAL_BATCH, "devices": len(jax.devices())}
    rows = []
    losses = {}
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            continue
        compiled, (state, batch, rng) = ts._compiled_step(
            model, variables, x, n
        )
        c = compiled_costs(compiled) or {}
        _, metrics = compiled(state, batch, rng)
        loss = float(np.asarray(jax.device_get(metrics["loss"])).mean())
        losses[n] = loss
        rows.append(
            {
                "mesh": n,
                "per_device_gflops": round(c.get("flops", 0) / 1e9, 3),
                "per_device_mb": round(c.get("bytes", 0) / 1e6, 1),
                "loss": round(loss, 6),
            }
        )
    out["rows"] = rows
    if 2 in losses and 8 in losses:
        out["loss_invariant_2v8"] = bool(
            np.isclose(losses[2], losses[8], rtol=1e-4)
        )
    if len(rows) >= 2:
        out["flops_ratio_first_last"] = round(
            rows[0]["per_device_gflops"]
            / max(rows[-1]["per_device_gflops"], 1e-9),
            2,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
