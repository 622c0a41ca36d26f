"""Torch-vs-torch control for the stf2 parity residual (VERDICT r3 #6).

Claim under test: the jax-vs-torch stf2 residual (max|dx_hat| 0.03-0.04,
<0.1% of positions with a large likelihood diff, bpp within ~1e-3 —
NOTES_ROUND3.md) is the signature of AR rounding-boundary flips under
cross-framework float noise, NOT mis-wiring. stf2 quantizes
``ste_round(y_slice - mu)`` inside its token-autoregressive loop
(reference ``stf2.py:1101``) where mu comes from attention+conv stacks
whose outputs differ between frameworks by ~1e-5 (measured).

Control experiment: run the ACTUAL reference torch model twice on the
same input — stock, and with ~1e-5 Gaussian noise added to the
muContextModel output (reference ``stf2.py:1085,1131``), emulating
reassociation-scale float noise ON THE REFERENCE'S OWN mu path with
everything else identical. If the claim holds, torch-vs-torch shows the
same signature: dx_hat of the same order, a tiny flipped fraction, bpp
nearly unchanged. A wiring bug cannot be produced this way by
construction — both runs are the same wiring.

Also runs an eps=0 determinism control (must be exactly 0 everywhere).

Usage: python tools/probe_stf2_control.py [--size 64] [--eps 1e-5]
Prints one JSON line; tests/test_stf2_control.py gates on it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.pop("PALLAS_AXON_POOL_IPS", None) is not None and (
    __name__ == "__main__"
):
    # same precision guard as probe_parity.py: the axon sitecustomize
    # degrades even CPU numerics once imported
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable] + sys.argv)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def _forward(ref, xt, eps: float, seed: int):
    """Reference forward with eps-Gaussian noise added to the
    muContextModel output (eps=0: stock forward)."""
    import torch

    orig = ref.muContextModel.forward
    gen = torch.Generator().manual_seed(seed)

    def noisy(*a, **k):
        out = orig(*a, **k)
        if eps:
            out = out + eps * torch.randn(
                out.shape, generator=gen, dtype=out.dtype
            )
        return out

    ref.muContextModel.forward = noisy
    try:
        with torch.no_grad():
            return ref(xt)
    finally:
        ref.muContextModel.forward = orig


def run(size: int = 64, eps: float = 1e-5, seed: int = 1) -> dict:
    import torch

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (icm_tpu)
    sys.path.insert(0, here)
    from probe_parity import bpp_from_likelihoods, build_reference

    ref, _ = build_reference("stf2")
    rng = np.random.RandomState(seed)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    base = _forward(ref, xt, 0.0, seed)
    zero = _forward(ref, xt, 0.0, seed)  # determinism control
    pert = _forward(ref, xt, eps, seed)

    def dx(a, b):
        return float((a["x_hat"] - b["x_hat"]).abs().max())

    npix = size * size
    report = {
        "arch": "stf2",
        "size": size,
        "eps": eps,
        "determinism_max_dx": dx(base, zero),
        "control_max_dx_hat": dx(base, pert),
    }
    for out, tag in ((base, "base"), (pert, "pert")):
        liks = {
            k: np.asarray(v.detach())
            for k, v in out["likelihoods"].items()
        }
        report[f"{tag}_bpp"] = bpp_from_likelihoods(liks, npix)
    report["control_bpp_diff"] = abs(
        report["pert_bpp"] - report["base_bpp"]
    )
    for k in base["likelihoods"]:
        d = (
            (base["likelihoods"][k] - pert["likelihoods"][k])
            .abs()
            .detach()
            .numpy()
        )
        report[f"control_max_dlik_{k}"] = float(d.max())
        report[f"control_frac_dlik_{k}_gt_1e2"] = float((d > 1e-2).mean())
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--eps", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)
    print(json.dumps(run(args.size, args.eps, args.seed)))


if __name__ == "__main__":
    main()
