"""Import the UNTRUSTED reference codebase (/root/reference) for parity
testing and baseline measurement — development tooling, not product code.

The reference is a CompressAI fork whose native modules ship only as
prebuilt py3.8 ``.so`` files (``compressai/ans``, ``compressai/_CXX`` —
SURVEY.md §1 L0) that cannot import here, and whose model files import
``timm`` (absent) and Detectron2 (absent, only needed by the ICM model
files we never import). This module stubs exactly those seams:

- ``compressai`` and ``compressai.models`` are installed as *namespace*
  modules pointing at the reference tree WITHOUT executing their
  ``__init__.py`` (which would import every model incl. the
  Detectron2-dependent ones); submodules import normally through
  ``__path__``.
- ``compressai.ans`` / ``compressai._CXX`` are backed by this repo's own
  coder (``icm_tpu.coding``), which reproduces the reference integer
  semantics (reference API per ``entropy_models.py:13,33-41``).
- ``timm.models.layers`` provides the three symbols the reference uses
  (``stf.py:5``): ``DropPath``, ``to_2tuple``, ``trunc_normal_``.

Everything else (entropy models, layers, cnn/stf model code) runs as-is
under the installed torch-CPU, giving a runnable reference for golden
values and timing baselines.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    return os.path.isdir(os.path.join(root, "compressai"))


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(torch.nn.Module):
        """Stochastic depth (timm semantics); identity in eval or p=0."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _install_torchvision_stub():
    """The reference uses torchvision only for ``ops.nms``
    (retinanet/model.py:5) and ``transforms``/``utils`` names in its
    dataloader (retinanet/dataloader.py:10). Provide a functional nms and
    bare modules so every model file imports."""
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            xy1 = torch.maximum(boxes[i, :2], boxes[rest, :2])
            xy2 = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
            wh = (xy2 - xy1).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * (
                boxes[rest, 3] - boxes[rest, 1]
            )
            iou = inter / (area_i + area_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.int64)

    ops.nms = nms
    tv.ops = ops
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.utils = types.ModuleType("torchvision.utils")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils


def _install_native_stubs():
    """Back compressai.ans / compressai._CXX with icm_tpu.coding."""
    from icm_tpu import coding

    ans = types.ModuleType("compressai.ans")
    ans.RansEncoder = coding.RansEncoder
    ans.BufferedRansEncoder = coding.BufferedRansEncoder

    class RansDecoder(coding.RansDecoder):
        # reference call sites tensor-ify the return (`torch.Tensor(rv)`),
        # which accepts numpy; keep list for exact List[int] parity.
        def decode_stream(self, *a, **k):
            return [int(v) for v in super().decode_stream(*a, **k)]

        def decode_with_indexes(self, *a, **k):
            return [int(v) for v in super().decode_with_indexes(*a, **k)]

    ans.RansDecoder = RansDecoder
    sys.modules["compressai.ans"] = ans

    cxx = types.ModuleType("compressai._CXX")

    def pmf_to_quantized_cdf(pmf, precision=16):
        return [int(v) for v in coding.pmf_to_quantized_cdf(pmf, precision)]

    cxx.pmf_to_quantized_cdf = pmf_to_quantized_cdf
    sys.modules["compressai._CXX"] = cxx
    return ans, cxx


def load_reference(root: str = REFERENCE_ROOT):
    """Install the stubbed ``compressai`` package; returns the module.

    After this, ``import compressai.models.cnn`` etc. work normally
    (except the Detectron2-dependent ICM files, which stay unimportable —
    their behavior is specified by SURVEY.md §2.2/§3.5 instead).
    """
    if "compressai" in sys.modules:
        return sys.modules["compressai"]
    if not reference_available(root):
        raise FileNotFoundError(f"reference tree not found at {root}")

    _install_timm_stub()
    _install_torchvision_stub()

    pkg = types.ModuleType("compressai")
    pkg.__path__ = [os.path.join(root, "compressai")]
    # entropy-coder registry surface (reference compressai/__init__.py:22-62)
    pkg._entropy_coder = "ans"
    pkg._available_entropy_coders = ["ans"]
    pkg.available_entropy_coders = lambda: pkg._available_entropy_coders
    pkg.get_entropy_coder = lambda: pkg._entropy_coder

    def set_entropy_coder(name):
        if name not in pkg._available_entropy_coders:
            raise ValueError(f'Invalid entropy coder "{name}"')
        pkg._entropy_coder = name

    pkg.set_entropy_coder = set_entropy_coder
    sys.modules["compressai"] = pkg

    models = types.ModuleType("compressai.models")
    models.__path__ = [os.path.join(root, "compressai", "models")]
    sys.modules["compressai.models"] = models
    pkg.models = models

    ans, cxx = _install_native_stubs()
    pkg.ans = ans
    pkg._CXX = cxx
    return pkg


def ref_wacnn(**kwargs):
    """Reference WACNN (cnn.py:23), eval mode."""
    load_reference()
    from compressai.models.cnn import WACNN

    return WACNN(**kwargs).eval()


def ref_stf(**kwargs):
    """Reference SymmetricalTransFormer (stf.py:384), eval mode."""
    load_reference()
    from compressai.models.stf import SymmetricalTransFormer

    return SymmetricalTransFormer(**kwargs).eval()


def ref_stf10(**kwargs):
    """Reference SymmetricalTransFormer7 (stf10.py:388), eval mode.

    Its DeepLab student defaults to a pretrained-backbone download
    (deeplab/backbone/resnet.py:216-222) — impossible in a zero-egress
    environment — so the backbone loader is patched to skip the fetch
    (weight VALUES don't matter for layout/conversion work)."""
    load_reference()
    import compressai.models.deeplab.backbone.resnet as dlres

    orig = dlres._resnet

    def _resnet_no_fetch(arch, block, layers, pretrained, progress, **kw):
        return orig(arch, block, layers, False, progress, **kw)

    dlres._resnet = _resnet_no_fetch
    try:
        from compressai.models.stf10 import SymmetricalTransFormer7

        return SymmetricalTransFormer7(**kwargs).eval()
    finally:
        dlres._resnet = orig
