"""Generate a COCO-format detection dataset on disk (images + real
``annotations/instances_val2017.json``) so the detection eval harness
runs end-to-end exactly as it would on COCO — the environment ships no
real COCO (zero egress). Objects are rendered shapes (3 classes:
circle / square / bar) with exact bounding-box annotations, over the
same structured backgrounds make_dataset.py uses.

Usage: python tools/make_coco_dataset.py --root /tmp/icm_coco \
          [--images 32] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_dataset import _bandlimited_noise, _gradient  # noqa: E402


def render(rng, size):
    bg = 0.6 * _gradient(rng, size) + 0.4 * _bandlimited_noise(rng, size)
    img = np.stack([bg * c for c in rng.uniform(0.4, 0.9, 3)], -1)
    anns = []
    for _ in range(rng.randint(1, 5)):
        cls = rng.randint(3)
        w = rng.randint(size // 10, size // 3)
        h = w if cls != 2 else max(4, w // 3)
        x0 = rng.randint(0, size - w)
        y0 = rng.randint(0, size - h)
        color = rng.uniform(0, 1, 3)
        yy, xx = np.ogrid[:size, :size]
        if cls == 0:  # circle
            cx, cy, r = x0 + w / 2, y0 + h / 2, w / 2
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
            theta = np.linspace(0, 2 * np.pi, 17)[:-1]
            poly = np.stack(
                [cx + r * np.cos(theta), cy + r * np.sin(theta)], -1
            ).reshape(-1)
        else:  # square / bar
            mask = (xx >= x0) & (xx < x0 + w) & (yy >= y0) & (yy < y0 + h)
            poly = np.array(
                [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h], float
            )
        img[mask] = color
        anns.append(
            {"bbox": [x0, y0, w, h], "cls": cls,
             "seg": [[float(v) for v in poly]]}
        )
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), anns


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/icm_coco")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--split", default="val2017")
    ns = ap.parse_args()
    img_dir = os.path.join(ns.root, ns.split)  # CocoDetectionDataset layout (data/coco.py:76)
    ann_dir = os.path.join(ns.root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for iid in range(1, ns.images + 1):
        arr, anns = render(rng, ns.size)
        fname = f"{iid:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, fname), quality=95)
        images.append(
            {"id": iid, "file_name": fname, "width": ns.size,
             "height": ns.size}
        )
        for a in anns:
            annotations.append(
                {
                    "id": aid, "image_id": iid,
                    "category_id": a["cls"] + 1,
                    "bbox": [float(v) for v in a["bbox"]],
                    "segmentation": a["seg"],
                    "area": float(a["bbox"][2] * a["bbox"][3]),
                    "iscrowd": 0,
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "circle"},
            {"id": 2, "name": "square"},
            {"id": 3, "name": "bar"},
        ],
    }
    with open(
        os.path.join(ann_dir, f"instances_{ns.split}.json"), "w"
    ) as f:
        json.dump(coco, f)
    print(
        f"{ns.images} images, {len(annotations)} annotations -> {ns.root}",
        flush=True,
    )


if __name__ == "__main__":
    main()
