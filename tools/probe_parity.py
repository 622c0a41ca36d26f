"""Probe forward parity of one zoo architecture against the ACTUAL
reference torch model (/root/reference via the reference bridge).

Usage: python tools/probe_parity.py <arch> [--size 64]

Builds the reference model (seed 0, eval), bumps every scale-producing
bias (+0.5 on any ``*scale*.bias`` state-dict key) so predicted scales
aren't degenerate, converts the state dict with
``zoo.convert_reference_state_dict``, runs both forwards on the same
image and prints a JSON line with max|dx_hat|, per-side bpp and output
keys. This is the measurement behind tests/test_reference_parity_all.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Precision guard: with PALLAS_AXON_POOL_IPS set, the axon sitecustomize
# initializes the remote-TPU backend at *interpreter start* — before this
# module runs — and matmuls/convs then run at bf16-ish default precision
# (measured 0.26% conv error), silently poisoning parity numbers. A
# same-process env pop is too late, so re-exec with a clean environment.
if os.environ.pop("PALLAS_AXON_POOL_IPS", None) is not None and (
    __name__ == "__main__"
):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable] + sys.argv)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "jax" in sys.modules:  # imported as a library with jax already up
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def _enable_compile_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# (reference module, class) per arch — reference zoo/__init__.py:23-43
REF_CLASSES = {
    "cnn": ("cnn", "WACNN"),
    "cnn2": ("cnn2", "WACNN2"),
    "stf": ("stf", "SymmetricalTransFormer"),
    "stf2": ("stf2", "ClipEncoder"),
    "stf3": ("stf3", "ClipEncoder3"),
    "stf4": ("stf4", "ClipEncoder4"),
    "stf5": ("stf5", "SymmetricalTransFormer2"),
    "stf6": ("stf6", "SymmetricalTransFormer3"),
    "stf6_2": ("stf6_2", "SymmetricalTransFormer3"),
    "stf7": ("stf7", "SymmetricalTransFormer4"),
    "stf8": ("stf8", "SymmetricalTransFormer5"),
    "stf9": ("stf9", "SymmetricalTransFormer6"),
    "stf11": ("stf11", "ConditionalResidualCoding"),
    "stf12": ("stf12", "ConditionalResidualCoding2"),
    "stf13": ("stf13", "ConditionalResidualCoding3"),
    "stf14": ("stf14", "ResidualCoding"),
    "czigzag": ("czigzag", "conditionalZigzag"),
}


def build_reference(arch: str, scale_bias: float = 0.5):
    import torch

    from icm_tpu.utils.reference_bridge import load_reference, ref_stf10

    load_reference()
    import importlib

    torch.manual_seed(0)
    if arch == "stf10":
        # special-cased: its DeepLab student would fetch pretrained
        # weights (zero-egress env) — ref_stf10 patches the download out
        ref = ref_stf10()
    else:
        mod, cls_name = REF_CLASSES[arch]
        cls = getattr(
            importlib.import_module(f"compressai.models.{mod}"), cls_name
        )
        ref = cls().eval()
    if arch == "cnn2":
        # reference bug: cnn2.py:219 calls studentNet(decompressH) but
        # studentResNet.forward takes (img_batch, x) (model.py:384) — and
        # immediately overwrites img_batch with x, so the first arg is
        # dead. Adapt the call so the reference forward can run at all.
        orig_fwd = ref.studentNet.forward
        ref.studentNet.forward = lambda x, _f=orig_fwd: _f(x, x)
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    for k in sd:
        if "scale" in k and k.endswith(".bias"):
            sd[k] = sd[k] + scale_bias
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    return ref, sd


def bpp_from_likelihoods(liks, num_pixels):
    total = 0.0
    for v in liks.values():
        arr = np.asarray(v if not hasattr(v, "detach") else v.detach())
        total += -np.log2(np.clip(arr, 1e-12, None)).sum()
    return float(total / num_pixels)


class _patched_cuda_ones:
    """stf4's reference mask creation hard-codes device('cuda')
    (stf4.py:203-206); reroute to CPU for the duration of a call so the
    reference forward executes on this CPU-only torch build."""

    def __enter__(self):
        import torch

        self._orig = torch.ones

        def ones_cpu(*a, **k):
            d = k.get("device")
            if d is not None and str(d).startswith("cuda"):
                k["device"] = "cpu"
            return self._orig(*a, **k)

        torch.ones = ones_cpu
        return self

    def __exit__(self, *exc):
        import torch

        torch.ones = self._orig


def run(arch: str, size: int, scale_bias: float = 0.5, seed: int = 1) -> dict:
    _enable_compile_cache()
    import jax.numpy as jnp
    import torch

    from icm_tpu.models import create_model
    from icm_tpu.zoo import convert_reference_state_dict

    ref, sd = build_reference(arch, scale_bias=scale_bias)
    params = convert_reference_state_dict(arch, sd)
    if isinstance(params, dict) and set(params) == {"params", "batch_stats"}:
        variables = params
    else:
        variables = {"params": params}

    rng = np.random.RandomState(seed)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    args_t = (xt,)
    if arch == "czigzag":
        x2 = rng.rand(1, size, size, 3).astype(np.float32)
        args_t = (xt, torch.from_numpy(np.transpose(x2, (0, 3, 1, 2))))

    with torch.no_grad(), _patched_cuda_ones():
        ref_out = ref(*args_t)
    del ref

    model = create_model(arch)
    args_j = (jnp.asarray(x),)
    if arch == "czigzag":
        args_j = (jnp.asarray(x), jnp.asarray(x2))
    out = model.apply(variables, *args_j, training=False)

    report = {"arch": arch, "size": size, "ref_keys": sorted(ref_out)}
    xkey = "x_hat" if "x_hat" in ref_out else "decompressedImage"
    if xkey in ref_out:
        xh_ref = np.transpose(
            np.asarray(ref_out[xkey].detach()), (0, 2, 3, 1)
        )
        mine = np.asarray(out[xkey if xkey in out else "x_hat"])
        if mine.shape == xh_ref.shape:
            report["max_dx_hat"] = float(np.abs(mine - xh_ref).max())
        else:
            report["shape_mismatch"] = [list(mine.shape), list(xh_ref.shape)]
    else:
        # cnn2 exposes no reconstruction (its "decompressH" is the
        # student's layer1 features, model.py:412) — the codec claim
        # rests on the likelihood/bpp comparison below
        report["max_dx_hat"] = None

    npix = size * size
    ref_liks = {
        k: np.transpose(np.asarray(v.detach()), (0, 2, 3, 1))
        for k, v in ref_out["likelihoods"].items()
    }
    report["ref_bpp"] = bpp_from_likelihoods(ref_liks, npix)
    report["my_bpp"] = bpp_from_likelihoods(out["likelihoods"], npix)
    report["bpp_diff"] = abs(report["ref_bpp"] - report["my_bpp"])
    # per-likelihood max diffs where shapes line up; also the FRACTION of
    # positions with a large diff — autoregressive quantizers can flip a
    # handful of round() boundaries on cross-framework float noise (each
    # flip moves that element's likelihood by O(1) and perturbs every
    # later AR step), so "max" alone can't distinguish a localized flip
    # cascade from a wiring bug. A real wiring bug moves a large fraction.
    for k, rv in ref_liks.items():
        mv = out["likelihoods"].get(k)
        if mv is not None and np.shape(mv) == rv.shape:
            d = np.abs(np.asarray(mv) - rv)
            report[f"max_dlik_{k}"] = float(d.max())
            report[f"frac_dlik_{k}_gt_1e2"] = float((d > 1e-2).mean())
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arch", help="one arch, or comma-separated batch")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--scale-bias", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=1)
    ns = ap.parse_args()
    failed = False
    for arch in ns.arch.split(","):
        try:
            print(json.dumps(run(arch, ns.size, ns.scale_bias, ns.seed)), flush=True)
        except Exception as e:  # print a diagnosable record, exit nonzero
            import traceback

            print(json.dumps({"arch": arch, "error": repr(e)}), flush=True)
            traceback.print_exc(file=sys.stderr)
            failed = True
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
