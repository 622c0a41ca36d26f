"""Detection focal loss.

Behavioral parity with the reference ``FocalLoss`` (reference:
``compressai/models/retinanet/losses.py``): anchor-to-gt IoU matching
(positive >= 0.5, negative < 0.4), alpha=0.25 / gamma=2 focal BCE on
classifications, smooth-L1-like regression loss on positives with
(0.1, 0.1, 0.2, 0.2) target normalization, beta = 1/9.

TPU note: the loss is computed per-image with a FIXED max number of gt
boxes (padded with -1 labels like the reference's annotation padding), so
the whole thing jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_matrix(anchors, boxes):
    """anchors (A, 4), boxes (G, 4) -> (A, G) IoU."""
    ax1, ay1, ax2, ay2 = (anchors[:, i : i + 1] for i in range(4))  # (A, 1)
    bx1, by1, bx2, by2 = (boxes[None, :, i] for i in range(4))  # (1, G)
    inter_w = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    inter_h = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = inter_w * inter_h
    area_a = jnp.clip(ax2 - ax1, 0) * jnp.clip(ay2 - ay1, 0)  # (A, 1)
    area_b = jnp.clip(bx2 - bx1, 0) * jnp.clip(by2 - by1, 0)  # (1, G)
    union = area_a + area_b - inter
    return inter / jnp.clip(union, 1e-8)


def focal_loss(
    classifications,
    regressions,
    anchors,
    annotations,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """classifications (B, A, K) post-sigmoid; regressions (B, A, 4);
    anchors (A, 4); annotations (B, G, 5) with [x1,y1,x2,y2,label],
    label = -1 for padding. Returns (cls_loss, reg_loss) scalars."""

    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights

    def per_image(cls, reg, ann):
        valid = ann[:, 4] >= 0  # (G,)
        n_valid = valid.sum()
        boxes = ann[:, :4]
        iou = _iou_matrix(anchors, boxes)  # (A, G)
        iou = jnp.where(valid[None, :], iou, -1.0)
        iou_max = iou.max(axis=1)
        iou_arg = iou.argmax(axis=1)

        cls = jnp.clip(cls, 1e-4, 1.0 - 1e-4)
        assigned_label = ann[iou_arg, 4].astype(jnp.int32)
        K = cls.shape[-1]
        targets = jax.nn.one_hot(assigned_label, K) * (iou_max >= 0.5)[:, None]
        ignore = (iou_max >= 0.4) & (iou_max < 0.5)

        alpha_factor = jnp.where(targets == 1.0, alpha, 1.0 - alpha)
        focal_weight = jnp.where(targets == 1.0, 1.0 - cls, cls) ** gamma
        bce = -(targets * jnp.log(cls) + (1.0 - targets) * jnp.log(1.0 - cls))
        cls_loss = alpha_factor * focal_weight * bce
        cls_loss = jnp.where(ignore[:, None], 0.0, cls_loss)
        # no-gt image: all-negative classification loss (reference behavior)
        num_pos = jnp.clip(((iou_max >= 0.5) & (n_valid > 0)).sum(), 1.0)
        cls_total = cls_loss.sum() / num_pos

        # regression on positives
        gt = boxes[iou_arg]
        gw = jnp.clip(gt[:, 2] - gt[:, 0], 1.0)
        gh = jnp.clip(gt[:, 3] - gt[:, 1], 1.0)
        gx = gt[:, 0] + 0.5 * gw
        gy = gt[:, 1] + 0.5 * gh
        t = jnp.stack(
            [
                (gx - ctr_x) / widths / 0.1,
                (gy - ctr_y) / heights / 0.1,
                jnp.log(gw / widths) / 0.2,
                jnp.log(gh / heights) / 0.2,
            ],
            axis=1,
        )
        diff = jnp.abs(t - reg)
        reg_loss = jnp.where(
            diff <= 1.0 / 9.0, 0.5 * 9.0 * diff ** 2, diff - 0.5 / 9.0
        )
        pos = (iou_max >= 0.5) & (n_valid > 0)
        reg_total = jnp.where(
            pos[:, None], reg_loss, 0.0
        ).sum() / jnp.clip(pos.sum() * 4, 1.0)
        return cls_total, reg_total

    cls_l, reg_l = jax.vmap(per_image)(classifications, regressions, annotations)
    return cls_l.mean(), reg_l.mean()


def seg_focal_loss(logits, labels, alpha: float = 0.5, gamma: float = 2.0,
                   ignore_index: int = -1):
    """Focal cross-entropy for segmentation (reference
    deeplab/high_utils/loss.py:5-21: focal weighting of per-pixel CE)."""
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    focal = alpha * (1.0 - jnp.exp(-ce)) ** gamma * ce
    return jnp.where(valid, focal, 0.0).sum() / jnp.clip(valid.sum(), 1)
