"""Flat-directory image datasets + batch iterator.

Behavioral parity with the reference datasets (reference:
``compressai/datasets/utils.py:23-89`` ``ImageFolder`` — a flat
``root/split/`` directory of images; ``utils.py:92-157``
``ImageFolder_Czigzag`` — pairs each image with a sibling conditioning
image in ``Large_GAN_x4_decompressed_015_x4/``).

TPU-native: a thread-prefetched numpy batch iterator producing fixed-shape
(B, H, W, 3) float32 arrays ready for ``jax.device_put`` — static shapes
keep XLA from recompiling per batch.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def _list_images(d: str):
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if os.path.splitext(f)[1].lower() in _EXTS
    )


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


class ImageFolder:
    def __init__(
        self,
        root: str,
        split: str = "train",
        transform: Optional[Callable] = None,
    ):
        splitdir = os.path.join(root, split)
        if not os.path.isdir(splitdir):
            raise RuntimeError(f'Invalid directory "{splitdir}"')
        self.samples = _list_images(splitdir)
        self.transform = transform

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = load_image(self.samples[idx])
        if self.transform is not None:
            img = self.transform(img)
        return img


class ImageFolderCzigzag(ImageFolder):
    """Pairs each image with the same-named conditioning image from a
    sibling directory (reference datasets/utils.py:92-157)."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        context_dirname: str = "Large_GAN_x4_decompressed_015_x4",
        transform: Optional[Callable] = None,
    ):
        super().__init__(root, split, transform=None)
        self.context_dir = os.path.join(root, context_dirname)
        self.pair_transform = transform

    def __getitem__(self, idx: int):
        path = self.samples[idx]
        img = load_image(path)
        ctx_path = os.path.join(self.context_dir, os.path.basename(path))
        ctx = load_image(ctx_path)
        if self.pair_transform is not None:
            img, ctx = self.pair_transform(img, ctx)
        return img, ctx


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    prefetch: int = 2,
    epochs: Optional[int] = 1,
    workers: int = 0,
) -> Iterator[np.ndarray]:
    """Threaded prefetching batch iterator yielding stacked numpy batches.

    ``workers > 0`` decodes samples in a fork-based process pool — PIL
    decode holds the GIL, so on multi-core hosts the producer thread
    alone cannot outrun an accelerator train step (reference loads via
    torch DataLoader workers, train.py:419-433; this is the equivalent).
    The pool forks lazily on first use and is torn down with the
    iterator."""

    def indices():
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(dataset))
            if shuffle:
                rng.shuffle(order)
            yield from (order[i : i + batch_size]
                        for i in range(0, len(order), batch_size))
            epoch += 1

    pool = None
    if workers > 0:
        import multiprocessing as mp

        pool = mp.get_context("fork").Pool(workers)

    def make_batch(idx):
        if pool is not None:
            items = pool.map(dataset.__getitem__, [int(i) for i in idx])
        else:
            items = [dataset[int(i)] for i in idx]
        if isinstance(items[0], tuple):
            return tuple(np.stack(col) for col in zip(*items))
        return np.stack(items)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _DONE = object()

    def producer():
        for idx in indices():
            if drop_remainder and len(idx) < batch_size:
                continue
            q.put(make_batch(idx))
        q.put(_DONE)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            yield item
    finally:
        if pool is not None:
            pool.terminate()
