"""Image transforms (numpy, HWC float32 in [0, 1])."""

from __future__ import annotations

import numpy as np


def random_crop(img: np.ndarray, size: tuple, rng: np.random.Generator):
    h, w = size
    H, W = img.shape[:2]
    if H < h or W < w:  # pad reflect if too small
        img = np.pad(
            img,
            ((0, max(0, h - H)), (0, max(0, w - W)), (0, 0)),
            mode="reflect",
        )
        H, W = img.shape[:2]
    top = int(rng.integers(0, H - h + 1))
    left = int(rng.integers(0, W - w + 1))
    return img[top : top + h, left : left + w]


def center_crop(img: np.ndarray, size: tuple):
    h, w = size
    H, W = img.shape[:2]
    top = max(0, (H - h) // 2)
    left = max(0, (W - w) // 2)
    return img[top : top + h, left : left + w]


def random_hflip(img: np.ndarray, rng: np.random.Generator, p: float = 0.5):
    if rng.random() < p:
        return img[:, ::-1]
    return img


def resize_min_max_side(
    img: np.ndarray, min_side: int = 256, max_side: int = 256
):
    """Resize so the short side is min_side, capped by max_side on the long
    side (reference Resizer, retinanet/dataloader.py:339-373). Returns
    (resized, scale)."""
    from PIL import Image

    H, W = img.shape[:2]
    smallest, largest = min(H, W), max(H, W)
    scale = min_side / smallest
    if largest * scale > max_side:
        scale = max_side / largest
    nh, nw = int(round(H * scale)), int(round(W * scale))
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    out = np.asarray(pil.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0
    return out, scale


def pad_to_multiple(img: np.ndarray, multiple: int = 64):
    """Zero-pad H, W up to a multiple (the eval harness pads to x64,
    reference eval_model/__main__.py:96-139)."""
    H, W = img.shape[:2]
    ph = (multiple - H % multiple) % multiple
    pw = (multiple - W % multiple) % multiple
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    return img, (H, W)
