"""CSV detection dataset.

Behavioral parity with the reference ``CSVDataset`` (reference:
``compressai/models/retinanet/dataloader.py:126-300``): an annotations CSV
``path,x1,y1,x2,y2,class_name`` (empty coords = negative image) plus a
class-map CSV ``class_name,id``.
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

from .image_folder import load_image
from .transforms import resize_min_max_side


class CSVDataset:
    def __init__(
        self,
        train_file: str,
        class_list: str,
        root: str = "",
        min_side: int = 256,
        max_side: int = 256,
    ):
        self.root = root
        with open(class_list) as f:
            self.classes = {
                row[0]: int(row[1]) for row in csv.reader(f) if row
            }
        self.labels = {v: k for k, v in self.classes.items()}

        self.image_data: dict = {}
        with open(train_file) as f:
            for row in csv.reader(f):
                if not row:
                    continue
                path, x1, y1, x2, y2, cls = (row + [""] * 6)[:6]
                entry = self.image_data.setdefault(path, [])
                if x1 == "":
                    continue  # negative sample
                entry.append(
                    [float(x1), float(y1), float(x2), float(y2),
                     float(self.classes[cls])]
                )
        self.image_names = sorted(self.image_data)
        self.min_side = min_side
        self.max_side = max_side

    @property
    def num_classes(self) -> int:
        return max(self.classes.values()) + 1

    def __len__(self):
        return len(self.image_names)

    def __getitem__(self, idx: int):
        name = self.image_names[idx]
        img = load_image(os.path.join(self.root, name))
        annots = np.asarray(self.image_data[name], np.float32).reshape(-1, 5)
        img, scale = resize_min_max_side(img, self.min_side, self.max_side)
        annots = annots.copy()
        annots[:, :4] *= scale
        return {"img": img, "annot": annots, "scale": scale, "name": name}
