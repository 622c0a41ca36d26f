"""OpenImages detection dataset (reference
``compressai/models/retinanet/oid_dataset.py:17-260``).

Self-contained CSV parsing — no skimage/torch. Layout (v4):

    root/
      images/{train,validation,test}/<ImageID>.jpg
      annotations/
        class-descriptions-boxable.csv           # MID,label
        <subset>/<subset>-annotations-bbox.csv   # normalized xyxy rows

The reference builds a JSON cache of per-image annotations on first use
(oid_dataset.py:181-191); we do the same so repeat epochs skip the CSV
scan. Samples use this framework's detection contract
({"img", "annot" (N,5 absolute xyxy+cls), "scale", "image_id"}) so the
Coco collate/prefetch pipeline and mAP evaluator work unchanged.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

__all__ = ["OpenImagesDataset", "load_boxable_labels"]


def load_boxable_labels(metadata_dir: str) -> Dict[str, int]:
    """MID -> contiguous class index from class-descriptions-boxable.csv
    (reference oid_dataset.py:17-36)."""
    path = os.path.join(metadata_dir, "class-descriptions-boxable.csv")
    cls_index: Dict[str, int] = {}
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if row:  # last row is often empty
                cls_index[row[0]] = len(cls_index)
    return cls_index


def _parse_annotations(
    ann_path: str,
    images_dir: str,
    cls_index: Dict[str, int],
) -> Dict[str, dict]:
    """One pass over <subset>-annotations-bbox.csv, grouping normalized
    boxes per image and recording image sizes (oid_dataset.py:80-157).
    Degenerate boxes (zero pixels after rounding) are dropped like the
    reference; images missing on disk are skipped."""
    per_image: Dict[str, dict] = {}
    sizes: Dict[str, tuple] = {}
    with open(ann_path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            frame = row["ImageID"]
            label = row["LabelName"]
            if label not in cls_index:
                continue
            if frame in sizes:
                w, h = sizes[frame]
            else:
                img_path = os.path.join(images_dir, frame + ".jpg")
                try:
                    with Image.open(img_path) as img:
                        w, h = img.size
                except OSError:
                    continue
                sizes[frame] = (w, h)
            x1, x2 = float(row["XMin"]), float(row["XMax"])
            y1, y2 = float(row["YMin"]), float(row["YMax"])
            if round(x2 * w) <= round(x1 * w) or round(y2 * h) <= round(y1 * h):
                continue
            box = {
                "cls_id": cls_index[label],
                "x1": x1, "y1": y1, "x2": x2, "y2": y2,
            }
            entry = per_image.setdefault(frame, {"w": w, "h": h, "boxes": []})
            entry["boxes"].append(box)
    return per_image


class OpenImagesDataset:
    """Detection samples with absolute-pixel (N, 5) xyxy+cls annotations."""

    def __init__(
        self,
        root: str,
        subset: str = "train",
        annotation_cache_dir: Optional[str] = None,
        max_side: Optional[int] = None,
    ):
        self.root = root
        self.subset = subset
        self.images_dir = os.path.join(root, "images", subset)
        self.max_side = max_side
        metadata_dir = os.path.join(root, "annotations")
        self.cls_index = load_boxable_labels(metadata_dir)
        self.id_to_label = {v: k for k, v in self.cls_index.items()}

        cache_dir = annotation_cache_dir or root
        cache = os.path.join(cache_dir, f"oid_{subset}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                self.annotations = json.load(f)
        else:
            ann_path = os.path.join(
                metadata_dir, subset, f"{subset}-annotations-bbox.csv"
            )
            self.annotations = _parse_annotations(
                ann_path, self.images_dir, self.cls_index
            )
            try:
                with open(cache, "w") as f:
                    json.dump(self.annotations, f)
            except OSError:
                pass  # read-only dataset dir: skip the cache
        self.image_ids: List[str] = sorted(self.annotations)

    def __len__(self) -> int:
        return len(self.image_ids)

    @property
    def num_classes(self) -> int:
        return len(self.cls_index)

    def image_aspect_ratio(self, idx: int) -> float:
        a = self.annotations[self.image_ids[idx]]
        return float(a["w"]) / float(a["h"])

    def __getitem__(self, idx: int) -> dict:
        frame = self.image_ids[idx]
        a = self.annotations[frame]
        path = os.path.join(self.images_dir, frame + ".jpg")
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        h, w = img.shape[:2]

        scale = 1.0
        if self.max_side is not None and max(h, w) > self.max_side:
            scale = self.max_side / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    (nw, nh), Image.BILINEAR
                ),
                np.float32,
            ) / 255.0

        boxes = a["boxes"]
        annot = np.zeros((len(boxes), 5), np.float32)
        for i, b in enumerate(boxes):
            annot[i] = (
                b["x1"] * w * scale, b["y1"] * h * scale,
                b["x2"] * w * scale, b["y2"] * h * scale, b["cls_id"],
            )
        return {
            "img": img,
            "annot": annot,
            "scale": scale,
            "image_id": idx,
        }
