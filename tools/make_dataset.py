"""Generate a structured synthetic image corpus on disk.

The environment has no natural-image dataset and no egress to fetch one
(BASELINE.md), so real-data pipeline work uses these: images with
natural-image-like second-order statistics — smooth gradients, oriented
textures, occluding shapes, and band-limited noise — written as real
PNG files so the production loader path (PIL decode -> ImageFolder ->
augmentation -> device upload) is exercised exactly as it would be on
COCO/Kodak.

Usage: python tools/make_dataset.py --root /tmp/icm_data \
           [--train 600] [--val 64] [--size 256]
Layout matches the reference ImageFolder contract
(datasets/utils.py:23-89): root/train/*.png, root/val/*.png.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _gradient(rng, size):
    gx = np.linspace(0, 1, size)[None, :]
    gy = np.linspace(0, 1, size)[:, None]
    a, b = rng.uniform(-1, 1, 2)
    base = a * gx + b * gy
    return (base - base.min()) / max(float(np.ptp(base)), 1e-6)


def _texture(rng, size):
    f = rng.uniform(2, 24)
    theta = rng.uniform(0, np.pi)
    x = np.arange(size)
    xx, yy = np.meshgrid(x, x)
    phase = rng.uniform(0, 2 * np.pi)
    t = np.sin(
        2 * np.pi * f / size * (np.cos(theta) * xx + np.sin(theta) * yy)
        + phase
    )
    return 0.5 + 0.5 * t


def _shapes(rng, size, n=6):
    img = np.zeros((size, size))
    for _ in range(n):
        kind = rng.randint(2)
        cx, cy = rng.randint(0, size, 2)
        r = rng.randint(size // 16, size // 3)
        v = rng.uniform(0.2, 1.0)
        yy, xx = np.ogrid[:size, :size]
        if kind == 0:
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        else:
            mask = (abs(xx - cx) < r) & (abs(yy - cy) < r // 2 + 1)
        img[mask] = v
    return img


def _bandlimited_noise(rng, size):
    # low-pass filtered white noise ~ 1/f-ish spectrum
    spec = np.fft.rfft2(rng.standard_normal((size, size)))
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    rolloff = 1.0 / np.maximum(np.hypot(fy, fx), 1.0 / size)
    img = np.fft.irfft2(spec * rolloff, s=(size, size))
    img -= img.min()
    return img / max(float(np.ptp(img)), 1e-6)


def make_image(rng, size):
    layers = [
        _gradient(rng, size),
        _texture(rng, size),
        _shapes(rng, size),
        _bandlimited_noise(rng, size),
    ]
    chans = []
    for _ in range(3):
        w = rng.dirichlet(np.ones(len(layers)))
        c = sum(wi * li for wi, li in zip(w, layers))
        chans.append(c)
    img = np.stack(chans, -1)
    img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    return (img * 255).astype(np.uint8)


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/icm_data")
    ap.add_argument("--train", type=int, default=600)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ns = ap.parse_args()
    rng = np.random.RandomState(0)
    for split, n in (("train", ns.train), ("val", ns.val)):
        d = os.path.join(ns.root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            Image.fromarray(make_image(rng, ns.size)).save(
                os.path.join(d, f"{split}_{i:05d}.png")
            )
        print(f"{split}: {n} images -> {d}", flush=True)


if __name__ == "__main__":
    main()
