#!/usr/bin/env python
"""Conditional codec training (reference ``train_czigzag.py``): model
czigzag with the paired conditioning-image dataset
(``ImageFolderCzigzag``); loss = lambda*255^2*MSE + bpp
(train_czigzag.py:58-71); forward(img, up_x4)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import apply_precision, base_parser, model_kwargs  # noqa: E402


def main(argv=None):
    p = base_parser(default_model="czigzag")
    p.add_argument(
        "--context-dirname", default="Large_GAN_x4_decompressed_015_x4"
    )
    args = p.parse_args(argv)

    import jax

    from icm_tpu.data import ImageFolderCzigzag, batch_iterator
    from icm_tpu.data.transforms import random_crop, random_hflip
    from icm_tpu.models import create_model
    from icm_tpu.train import RateDistortionLoss
    from icm_tpu.train.engine import run_training

    rng = np.random.default_rng(args.seed)
    size = tuple(args.patch_size)

    def pair_tf(img, ctx):
        # synchronized crop/flip
        H, W = img.shape[:2]
        h, w = size
        top = int(rng.integers(0, max(1, H - h + 1)))
        left = int(rng.integers(0, max(1, W - w + 1)))
        img = img[top : top + h, left : left + w]
        ctx = ctx[top : top + h, left : left + w]
        if rng.random() < 0.5:
            img, ctx = img[:, ::-1].copy(), ctx[:, ::-1].copy()
        return img, ctx

    train_ds = ImageFolderCzigzag(
        args.dataset, args.train_split, args.context_dirname, pair_tf
    )
    test_ds = ImageFolderCzigzag(
        args.dataset, args.test_split, args.context_dirname, pair_tf
    )

    def train_batches(epoch):
        it = batch_iterator(
            train_ds, args.batch_size, shuffle=True,
            seed=args.seed + epoch, epochs=1,
        )
        for i, b in enumerate(it):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            yield b

    def eval_batches():
        yield from batch_iterator(
            test_ds, args.test_batch_size, shuffle=False, epochs=1
        )

    model = create_model(args.model, **model_kwargs(args))
    criterion = RateDistortionLoss(args.lmbda)

    def make_step(model, criterion):
        def loss_fn(params, batch, rng_):
            img, ctx = batch
            out = model.apply(
                {"params": params}, img, ctx, training=True,
                rngs={"noise": rng_, "dropout": jax.random.fold_in(rng_, 1)},
            )
            res = criterion(out, img)
            aux = model.apply({"params": params}, method=model.aux_loss)
            return res["loss"] + aux, {**res, "aux_loss": aux}

        def step(state, batch, rng_):
            rng_ = jax.random.fold_in(rng_, state.step)
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng_
            )
            return state.apply_gradients(grads), m

        return step

    init_batch = next(iter(train_batches(0)))
    run_training(
        model=model,
        criterion=criterion,
        make_step=make_step,
        train_batches=train_batches,
        eval_batches=eval_batches,
        init_batch=tuple(init_batch),
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
        seed=args.seed,
        save_path=args.save,
        checkpoint=args.checkpoint,
        data_parallel=False,
        make_eval=False,
    )


if __name__ == "__main__":
    main()
