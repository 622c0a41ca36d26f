"""COCO detection dataset without pycocotools.

Behavioral parity with the reference ``CocoDataset``/``collater``/
``Resizer``/``Augmenter``/``Normalizer`` (reference:
``compressai/models/retinanet/dataloader.py:23-458``): loads COCO
instances json, maps the 80 category ids to contiguous labels sorted by
id, returns per-image (image, annots (G, 5) [x1,y1,x2,y2,label]); resize
to min/max side 256; random horizontal flip; batches pad annotations with
-1 rows (which also makes the focal loss jit-able with static shapes).

pycocotools is not available in this environment; the json is parsed
directly (annotations only need boxes + category ids for detection).

AspectRatioBasedSampler (reference ``retinanet/dataloader.py:410-458``)
is deliberately NOT reproduced. The reference groups images of similar
aspect ratio into a batch so ``collater``'s pad-to-largest wastes fewer
pixels — a throughput heuristic for eager CUDA, where every batch shape
is free. Under XLA each distinct padded (H, W) is a separate compiled
executable, so ratio-grouped batches would compile one program per
ratio bucket and re-trigger compilation whenever the sampler emits a new
largest-shape combination. The TPU-native trade is the opposite:
``coco_collate`` pads every batch to ONE static shape (largest H/W in
the batch, rounded to ``pad_multiple``), paying bounded pad FLOPs (the
Resizer caps the long side at 256, so waste is bounded by the batch's
aspect-ratio spread) to keep exactly one executable and zero
recompiles. Annotation rows are -1-padded to a static count for
the same reason (jit-able focal loss).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .image_folder import load_image
from .transforms import resize_min_max_side


class CocoDetectionDataset:
    def __init__(
        self,
        root: str,
        set_name: str = "val2017",
        ann_file: Optional[str] = None,
        min_side: int = 256,
        max_side: int = 256,
        augment: bool = False,
        seed: int = 0,
    ):
        self.root = root
        self.set_name = set_name
        ann_file = ann_file or os.path.join(
            root, "annotations", f"instances_{set_name}.json"
        )
        with open(ann_file) as f:
            coco = json.load(f)

        cats = sorted(coco["categories"], key=lambda c: c["id"])
        self.cat_id_to_label = {c["id"]: i for i, c in enumerate(cats)}
        self.label_to_cat_id = {i: c["id"] for i, c in enumerate(cats)}
        self.class_names = {
            i: c.get("name", str(c["id"])) for i, c in enumerate(cats)
        }
        self.num_classes = len(cats)

        self.images = {im["id"]: im for im in coco["images"]}
        self.image_ids = [im["id"] for im in coco["images"]]
        self.anns = {iid: [] for iid in self.image_ids}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1:
                continue
            self.anns[a["image_id"]].append(
                [x, y, x + w, y + h, self.cat_id_to_label[a["category_id"]]]
            )
        self.min_side = min_side
        self.max_side = max_side
        self.augment = augment
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.image_ids)

    def image_path(self, idx: int) -> str:
        info = self.images[self.image_ids[idx]]
        return os.path.join(self.root, self.set_name, info["file_name"])

    def __getitem__(self, idx: int):
        img = load_image(self.image_path(idx))
        annots = np.asarray(
            self.anns[self.image_ids[idx]], np.float32
        ).reshape(-1, 5)

        if self.augment and self._rng.random() < 0.5:
            img = img[:, ::-1].copy()
            W = img.shape[1]
            x1 = annots[:, 0].copy()
            annots[:, 0] = W - annots[:, 2]
            annots[:, 2] = W - x1

        img, scale = resize_min_max_side(img, self.min_side, self.max_side)
        annots = annots.copy()
        annots[:, :4] *= scale
        return {"img": img, "annot": annots, "scale": scale,
                "image_id": self.image_ids[idx]}


def coco_collate(samples, pad_multiple: int = 32, max_annots: Optional[int] = None):
    """Pad images to common (multiple-aligned) size and annotations to a
    fixed count with -1 rows (reference collater, dataloader.py:301+)."""
    H = max(s["img"].shape[0] for s in samples)
    W = max(s["img"].shape[1] for s in samples)
    H = ((H + pad_multiple - 1) // pad_multiple) * pad_multiple
    W = ((W + pad_multiple - 1) // pad_multiple) * pad_multiple
    G = max(1, max(len(s["annot"]) for s in samples))
    if max_annots is not None:
        G = max_annots
    B = len(samples)
    imgs = np.zeros((B, H, W, 3), np.float32)
    annots = np.full((B, G, 5), -1.0, np.float32)
    for i, s in enumerate(samples):
        h, w = s["img"].shape[:2]
        imgs[i, :h, :w] = s["img"]
        g = min(len(s["annot"]), G)
        if g:
            annots[i, :g] = s["annot"][:g]
    return {
        "img": imgs,
        "annot": annots,
        "scale": np.asarray([s["scale"] for s in samples], np.float32),
        "image_id": np.asarray([s["image_id"] for s in samples]),
    }
