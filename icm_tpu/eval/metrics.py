"""Evaluation metrics.

Parity with the reference measurement harness (BASELINE.md):
  - PSNR (reference eval_model/__main__.py:78-80)
  - MS-SSIM (reference uses pytorch_msssim, __main__.py:32) — implemented
    natively in jax (5-scale, Gaussian 11x11 sigma 1.5, standard weights)
  - SegmentationMetric: streaming pixAcc + mIoU (reference
    deeplab/score.py:9-60)
  - COCO bbox mAP: self-contained AP@[.5:.95] evaluator (pycocotools is
    not available in this environment; this implements the standard
    101-point interpolated COCOeval protocol for bboxes)
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _ssim_components(a, b, max_val: float):
    """a, b: (B, H, W, C). Returns (mean ssim, mean contrast-structure)."""
    k = _gaussian_kernel()[:, :, None, None]
    C = a.shape[-1]
    kernel = jnp.tile(k, (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    cs = (2 * s_ab + C2) / (s_aa + s_bb + C2)
    ssim = ((2 * mu_ab + C1) / (mu_aa + mu_bb + C1)) * cs
    return ssim.mean(), cs.mean()


def ms_ssim(a, b, max_val: float = 1.0):
    """5-scale MS-SSIM (standard weights)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    vals = []
    for i in range(5):
        s, cs = _ssim_components(a, b, max_val)
        vals.append(s if i == 4 else cs)
        if i < 4:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    vals = jnp.stack(vals)
    return jnp.prod(jnp.clip(vals, 1e-6) ** weights)


class SegmentationMetric:
    """Streaming pixAcc + mIoU (reference deeplab/score.py:9-60)."""

    def __init__(self, nclass: int):
        self.nclass = nclass
        self.reset()

    def reset(self):
        self.total_inter = np.zeros(self.nclass, np.int64)
        self.total_union = np.zeros(self.nclass, np.int64)
        self.total_correct = 0
        self.total_label = 0

    def update(self, preds: np.ndarray, labels: np.ndarray):
        """preds: (..., K) logits or (...) class ids; labels (...) ids,
        ignore label < 0."""
        preds = np.asarray(preds)
        if preds.ndim == labels.ndim + 1:
            preds = preds.argmax(-1)
        labels = np.asarray(labels)
        valid = labels >= 0
        self.total_correct += int(((preds == labels) & valid).sum())
        self.total_label += int(valid.sum())
        for c in range(self.nclass):
            p = (preds == c) & valid
            l = labels == c
            self.total_inter[c] += int((p & l).sum())
            self.total_union[c] += int((p | l).sum())

    def get(self):
        pix_acc = self.total_correct / max(1, self.total_label)
        iou = self.total_inter / np.maximum(1, self.total_union)
        present = self.total_union > 0
        miou = float(iou[present].mean()) if present.any() else 0.0
        return pix_acc, miou


# --- COCO bbox mAP -----------------------------------------------------------

def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a (N,4), b (M,4) xyxy -> (N,M)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(br - tl, 0, None).prod(-1)
    area_a = np.clip(a[:, 2:] - a[:, :2], 0, None).prod(-1)
    area_b = np.clip(b[:, 2:] - b[:, :2], 0, None).prod(-1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def compute_map(
    detections: Dict[int, Dict],
    ground_truth: Dict[int, Dict],
    iou_thresholds: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05)),
    max_dets: int = 100,
) -> Dict[str, float]:
    """COCO-protocol bbox AP.

    detections[image_id] = {"boxes" (N,4) xyxy, "scores" (N,), "labels" (N,)}
    ground_truth[image_id] = {"boxes" (G,4) xyxy, "labels" (G,)}
    Returns {"mAP", "AP50", "AP75"} averaged over classes present in gt.
    """
    classes = sorted(
        {int(l) for g in ground_truth.values() for l in np.asarray(g["labels"])}
    )
    rec_thrs = np.linspace(0, 1, 101)
    ap_per_iou = defaultdict(list)

    for c in classes:
        # gather
        scores, matches_per_iou, n_gt = [], [[] for _ in iou_thresholds], 0
        for iid, gt in ground_truth.items():
            g_mask = np.asarray(gt["labels"]) == c
            g_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[g_mask]
            n_gt += len(g_boxes)
            det = detections.get(iid)
            if det is None:
                continue
            d_mask = np.asarray(det["labels"]) == c
            d_boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)[d_mask]
            d_scores = np.asarray(det["scores"], np.float64)[d_mask]
            order = np.argsort(-d_scores)[:max_dets]
            d_boxes, d_scores = d_boxes[order], d_scores[order]
            scores.extend(d_scores)
            iou = _box_iou(d_boxes, g_boxes) if len(g_boxes) else np.zeros(
                (len(d_boxes), 0)
            )
            for ti, t in enumerate(iou_thresholds):
                taken = np.zeros(len(g_boxes), bool)
                m = []
                for di in range(len(d_boxes)):
                    best, bj = t, -1
                    for gj in range(len(g_boxes)):
                        if not taken[gj] and iou[di, gj] >= best:
                            best, bj = iou[di, gj], gj
                    if bj >= 0:
                        taken[bj] = True
                        m.append(1)
                    else:
                        m.append(0)
                matches_per_iou[ti].extend(m)
        if n_gt == 0:
            continue
        scores = np.asarray(scores)
        order = np.argsort(-scores)
        for ti in range(len(iou_thresholds)):
            tp = np.asarray(matches_per_iou[ti])[order]
            fp = 1 - tp
            tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
            recall = tp_c / n_gt
            precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
            # monotone precision envelope + 101-point interpolation
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            if len(precision) == 0:
                prec_at = np.zeros_like(rec_thrs)
            else:
                idx = np.searchsorted(recall, rec_thrs, side="left")
                prec_at = np.where(
                    idx < len(precision),
                    precision[np.minimum(idx, len(precision) - 1)],
                    0.0,
                )
            ap_per_iou[ti].append(prec_at.mean())

    if not ap_per_iou:
        return {"mAP": 0.0, "AP50": 0.0, "AP75": 0.0}
    ap_by_t = [float(np.mean(ap_per_iou[t])) for t in range(len(iou_thresholds))]
    return {
        "mAP": float(np.mean(ap_by_t)),
        "AP50": ap_by_t[0],
        "AP75": ap_by_t[5] if len(ap_by_t) > 5 else ap_by_t[-1],
    }


# VOC-style palette for mask visualization (reference
# deeplab/high_utils/visualizer.py equivalent, torch/matplotlib-free)
def colorize_mask(mask: np.ndarray) -> np.ndarray:
    """(H, W) int class ids -> (H, W, 3) uint8 VOC-palette colors."""
    mask = np.asarray(mask)
    palette = np.zeros((256, 3), np.uint8)
    for i in range(256):
        c, j = i, 0
        r = g = b = 0
        while c:
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
            j += 1
        palette[i] = (r, g, b)
    return palette[np.clip(mask, 0, 255)]
