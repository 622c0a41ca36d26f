"""File-based training visualizer.

API-compatible analog of the reference's visdom dashboard
(``deeplab/high_utils/visualizer.py``: vis_scalar / vis_image /
vis_table): this environment (and most TPU pods) has no display server
or egress, so curves append to JSONL, images/tables write to files, and
anything can be tailed or post-processed offline.

Extra: :meth:`vis_segmentation` writes the input | ground-truth |
prediction panel the reference composes by hand in its validate loop
(``train_segmentation.py``), using the VOC palette via
``eval.metrics.colorize_mask``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _to_hwc_uint8(img: np.ndarray) -> np.ndarray:
    """Accept HWC/CHW, float [0,1] or uint8; return HWC uint8."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3:
        raise ValueError(f"expected 2D/3D image, got shape {img.shape}")
    if img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.transpose(img, (1, 2, 0))  # CHW -> HWC
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def _write_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(_to_hwc_uint8(img)).save(path)


class Visualizer:
    """Reference surface: ``Visualizer(env=...).vis_scalar/image/table``.

    ``logdir`` replaces the visdom server; ``id`` prefixes names like
    the reference does.
    """

    def __init__(self, logdir: str = "runs", env: str = "main",
                 id: Optional[str] = None, port: Any = None):
        # port accepted (and ignored) for drop-in compatibility
        self.dir = os.path.join(logdir, env)
        os.makedirs(self.dir, exist_ok=True)
        self.id = id

    def _name(self, name: str) -> str:
        return f"[{self.id}]{name}" if self.id is not None else name

    def _safe(self, name: str) -> str:
        return "".join(c if c.isalnum() or c in "-_." else "_"
                       for c in self._name(name))

    # --- reference API ------------------------------------------------------
    def vis_scalar(self, name: str, x, y, opts: Optional[dict] = None):
        xs = x if isinstance(x, list) else [x]
        ys = y if isinstance(y, list) else [y]
        path = os.path.join(self.dir, self._safe(name) + ".jsonl")
        with open(path, "a") as f:
            for xi, yi in zip(xs, ys):
                f.write(json.dumps({"x": float(xi), "y": float(yi)}) + "\n")

    def vis_image(self, name: str, img, env=None, opts=None) -> str:
        path = os.path.join(self.dir, self._safe(name) + ".png")
        _write_png(path, np.asarray(img))
        return path

    def vis_table(self, name: str, tbl: Dict[str, Any], opts=None) -> str:
        path = os.path.join(self.dir, self._safe(name) + ".json")
        with open(path, "w") as f:
            json.dump({str(k): v for k, v in tbl.items()}, f, indent=1,
                      default=str)
        return path

    # --- segmentation panel (reference validate-loop composition) ----------
    def vis_segmentation(self, name: str, image, target, pred,
                         sep: int = 4) -> str:
        """input | colorized GT | colorized prediction, one PNG."""
        from ..eval.metrics import colorize_mask

        img = _to_hwc_uint8(np.asarray(image))
        gt = colorize_mask(np.asarray(target))
        pr = colorize_mask(np.asarray(pred))
        h = img.shape[0]
        pad = np.full((h, sep, 3), 255, np.uint8)
        panel = np.concatenate([img, pad, gt, pad, pr], axis=1)
        path = os.path.join(self.dir, self._safe(name) + ".png")
        _write_png(path, panel)
        return path
