"""Shared CLI plumbing for the training entry points.

Mirrors the reference argparse surface (reference ``train.py:294-381``)
minus the hard-coded personal paths."""

from __future__ import annotations

import argparse
import functools

import numpy as np


def base_parser(default_model: str, default_lmbda: float = 1e-2):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default=default_model)
    p.add_argument("-d", "--dataset", required=True, help="dataset root")
    p.add_argument("--train-split", default="train")
    p.add_argument("--test-split", default="test")
    p.add_argument("-e", "--epochs", type=int, default=50)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lmbda", type=float, default=default_lmbda)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--test-batch-size", type=int, default=8)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--save", default="ckpt/best")
    p.add_argument("--checkpoint", default=None, help="resume path")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument(
        "--loader-workers", type=int, default=0,
        help="process-pool decode workers (0 = in-thread decode)",
    )
    p.add_argument(
        "--model-kwargs", default=None,
        help="JSON dict of model constructor overrides",
    )
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 activation pipeline for the transforms (f32 master "
        "params and entropy math; see icm_tpu.nn.set_activation_dtype)",
    )
    p.add_argument(
        "--vis-dir", default=None,
        help="write per-epoch loss/lr curves as JSONL under this "
        "directory (file-based analog of the reference's visdom "
        "dashboard; icm_tpu.utils.visualizer)",
    )
    return p


def make_visualizer(args):
    """Visualizer from --vis-dir (None when unset)."""
    if not getattr(args, "vis_dir", None):
        return None
    from icm_tpu.utils.visualizer import Visualizer

    return Visualizer(logdir=args.vis_dir, env=args.model)


def enable_compile_cache():
    """Persistent compile cache (same config as bench.py): full-size
    train graphs take minutes to compile over the remote-TPU tunnel;
    caching makes a resumed/re-lambda'd run start in seconds."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
    except Exception:
        pass


def apply_precision(args):
    """Apply --bf16 before any model tracing (also enables the
    persistent compile cache — every trainer calls this first)."""
    enable_compile_cache()
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        from icm_tpu.nn import set_activation_dtype

        set_activation_dtype(jnp.bfloat16)


def model_kwargs(args) -> dict:
    import json

    return json.loads(args.model_kwargs) if args.model_kwargs else {}


class TrainTransform:
    """Picklable crop+flip augmentation (process-pool loader workers fork
    and pickle the dataset; a closure over a Generator cannot cross).
    Each worker process lazily derives its own rng stream from
    (seed, pid) — with workers > 0 augmentation randomness is therefore
    reproducible per worker but not across pool layouts."""

    def __init__(self, size, seed):
        self.size = tuple(size)
        self.seed = seed
        self._rng = None
        self._pid = None

    def __call__(self, img):
        import os

        from icm_tpu.data.transforms import random_crop, random_hflip

        if self._rng is None or self._pid != os.getpid():
            self._pid = os.getpid()
            self._rng = np.random.default_rng((self.seed, self._pid))
        return random_hflip(
            random_crop(img, self.size, self._rng), self._rng
        ).copy()


class EvalTransform:
    def __init__(self, size):
        self.size = tuple(size)

    def __call__(self, img):
        from icm_tpu.data.transforms import center_crop

        return center_crop(img, self.size)


def image_batch_providers(args):
    """ImageFolder train/eval batch providers with random crops."""
    from icm_tpu.data import ImageFolder, batch_iterator

    size = tuple(args.patch_size)
    workers = getattr(args, "loader_workers", 0)

    train_ds = ImageFolder(
        args.dataset, args.train_split, TrainTransform(size, args.seed)
    )
    test_ds = ImageFolder(args.dataset, args.test_split, EvalTransform(size))

    def train_batches(epoch):
        it = batch_iterator(
            train_ds, args.batch_size, shuffle=True,
            seed=args.seed + epoch, epochs=1, workers=workers,
        )
        if args.steps_per_epoch:
            for i, b in enumerate(it):
                if i >= args.steps_per_epoch:
                    break
                yield b
        else:
            yield from it

    def eval_batches():
        yield from batch_iterator(
            test_ds, args.test_batch_size, shuffle=False, epochs=1,
        )

    init_batch = next(iter(train_batches(0)))
    return train_batches, eval_batches, init_batch
