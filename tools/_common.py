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
        "--model-kwargs", default=None,
        help="JSON dict of model constructor overrides",
    )
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 activation pipeline for the transforms (f32 master "
        "params and entropy math; see icm_tpu.nn.set_activation_dtype)",
    )
    return p


def apply_precision(args):
    """Apply --bf16 before any model tracing."""
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        from icm_tpu.nn import set_activation_dtype

        set_activation_dtype(jnp.bfloat16)


def model_kwargs(args) -> dict:
    import json

    return json.loads(args.model_kwargs) if args.model_kwargs else {}


def image_batch_providers(args):
    """ImageFolder train/eval batch providers with random crops."""
    from icm_tpu.data import ImageFolder, batch_iterator
    from icm_tpu.data.transforms import center_crop, random_crop, random_hflip

    rng = np.random.default_rng(args.seed)
    size = tuple(args.patch_size)

    def train_tf(img):
        return random_hflip(random_crop(img, size, rng), rng).copy()

    def test_tf(img):
        return center_crop(img, size)

    train_ds = ImageFolder(args.dataset, args.train_split, train_tf)
    test_ds = ImageFolder(args.dataset, args.test_split, test_tf)

    def train_batches(epoch):
        it = batch_iterator(
            train_ds, args.batch_size, shuffle=True,
            seed=args.seed + epoch, epochs=1,
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
