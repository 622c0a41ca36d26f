"""COCO semantic segmentation dataset (21 VOC-subset classes).

Behavioral parity with the reference ``COCOSegmentation``/
``SegmentationDataset`` (reference: ``mscoco.py:12-141``,
``segbase.py:10-93``): masks built from COCO instance annotations using
the 21-class VOC-subset category list (CAT_LIST), with synchronized
scale/crop/flip transforms for training and center-crop for val.

pycocotools is unavailable; polygons are rasterized with PIL and both
uncompressed and compressed-string RLE are decoded natively.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .image_folder import load_image

# VOC-subset COCO category ids (reference mscoco.py CAT_LIST)
CAT_LIST = [0, 5, 2, 16, 9, 44, 6, 3, 17, 62, 21, 67, 18, 19, 4,
            1, 64, 20, 63, 7, 72]


def _decode_compressed_rle(counts: str, h: int, w: int) -> np.ndarray:
    """Decode COCO compressed RLE (LEB128-style signed varint deltas)."""
    cnts = []
    i = 0
    while i < len(counts):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(counts[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
        if x & (1 << (5 * k - 1)):
            x -= 1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    mask = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in cnts:
        mask[pos : pos + c] = val
        pos += c
        val = 1 - val
    return mask.reshape(w, h).T  # column-major


def _rasterize(segm, h: int, w: int) -> np.ndarray:
    """Polygon list / RLE -> binary mask (h, w)."""
    if isinstance(segm, dict):  # RLE
        counts = segm["counts"]
        if isinstance(counts, str):
            return _decode_compressed_rle(counts, h, w)
        mask = np.zeros(h * w, np.uint8)
        pos, val = 0, 0
        for c in counts:
            mask[pos : pos + c] = val
            pos += c
            val = 1 - val
        return mask.reshape(w, h).T
    from PIL import Image, ImageDraw

    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in segm:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


class COCOSegmentation:
    NUM_CLASS = 21

    def __init__(
        self,
        root: str,
        split: str = "val",
        set_name: Optional[str] = None,
        crop_size: int = 480,
        base_size: int = 520,
        seed: int = 0,
    ):
        set_name = set_name or (
            "train2017" if split == "train" else "val2017"
        )
        self.root = root
        self.set_name = set_name
        self.split = split
        self.crop_size = crop_size
        self.base_size = base_size
        self._rng = np.random.default_rng(seed)

        ann_file = os.path.join(
            root, "annotations", f"instances_{set_name}.json"
        )
        with open(ann_file) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        cat_map = {c: i for i, c in enumerate(CAT_LIST)}
        self.anns = {}
        for a in coco.get("annotations", []):
            if a["category_id"] not in cat_map:
                continue
            self.anns.setdefault(a["image_id"], []).append(
                (a["segmentation"], cat_map[a["category_id"]])
            )
        # keep only images with at least ~1k labelled pixels (reference
        # mscoco.py filters by mask area during its preprocessing pass)
        self.image_ids = [i for i in self.images if i in self.anns]

    def __len__(self):
        return len(self.image_ids)

    def _gen_mask(self, iid) -> np.ndarray:
        info = self.images[iid]
        h, w = info["height"], info["width"]
        mask = np.zeros((h, w), np.uint8)
        for segm, label in self.anns.get(iid, []):
            m = _rasterize(segm, h, w)
            mask[m > 0] = label
        return mask

    def __getitem__(self, idx: int):
        iid = self.image_ids[idx]
        info = self.images[iid]
        img = load_image(
            os.path.join(self.root, self.set_name, info["file_name"])
        )
        mask = self._gen_mask(iid)
        if self.split == "train":
            img, mask = self._sync_transform(img, mask)
        else:
            img, mask = self._center_transform(img, mask)
        return img, mask.astype(np.int32)

    # --- synchronized transforms (reference segbase.py:10-93) --------------
    def _resize(self, img, mask, size_hw):
        from PIL import Image

        nh, nw = size_hw
        pi = Image.fromarray((img * 255).astype(np.uint8)).resize(
            (nw, nh), Image.BILINEAR
        )
        pm = Image.fromarray(mask).resize((nw, nh), Image.NEAREST)
        return np.asarray(pi, np.float32) / 255.0, np.asarray(pm, np.uint8)

    def _sync_transform(self, img, mask):
        rng = self._rng
        if rng.random() < 0.5:
            img, mask = img[:, ::-1], mask[:, ::-1]
        short = int(rng.integers(self.base_size // 2, self.base_size * 2))
        h, w = img.shape[:2]
        if h < w:
            nh, nw = short, int(w * short / h)
        else:
            nh, nw = int(h * short / w), short
        img, mask = self._resize(img, mask, (nh, nw))
        cs = self.crop_size
        if min(nh, nw) < cs:
            img = np.pad(img, ((0, max(0, cs - nh)), (0, max(0, cs - nw)), (0, 0)))
            mask = np.pad(mask, ((0, max(0, cs - nh)), (0, max(0, cs - nw))))
            nh, nw = img.shape[:2]
        top = int(rng.integers(0, nh - cs + 1))
        left = int(rng.integers(0, nw - cs + 1))
        return (
            img[top : top + cs, left : left + cs],
            mask[top : top + cs, left : left + cs],
        )

    def _center_transform(self, img, mask):
        h, w = img.shape[:2]
        short = self.crop_size
        if h < w:
            nh, nw = short, int(w * short / h)
        else:
            nh, nw = int(h * short / w), short
        img, mask = self._resize(img, mask, (nh, nw))
        top = (nh - short) // 2
        left = (nw - short) // 2
        return (
            img[top : top + short, left : left + short],
            mask[top : top + short, left : left + short],
        )
