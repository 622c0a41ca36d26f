#!/usr/bin/env python
"""Segmentation ICM training (reference ``train_segmentation.py``): model
stf10, loss = lambda*CE(student_out, mask) + 0.1*bpp; trains only the
prompt adapters and the DeepLab student (reference
train_segmentation.py:121: TrainList=['promot','student'])."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import apply_precision, base_parser, model_kwargs  # noqa: E402


def seg_batch_providers(args):
    from icm_tpu.data import COCOSegmentation, batch_iterator

    train_ds = COCOSegmentation(
        args.dataset, split="train", crop_size=args.patch_size[0],
        seed=args.seed,
    )
    val_ds = COCOSegmentation(
        args.dataset, split="val", crop_size=args.patch_size[0],
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
            val_ds, args.test_batch_size, shuffle=False, epochs=1,
        )

    return train_batches, eval_batches, next(iter(train_batches(0)))


def make_seg_step(model, criterion, extra_vars=None):
    import jax

    # non-trainable collections (the frozen DeepLab student's
    # batch_stats) must ride along or BatchNorm sees an empty collection
    extra = dict(extra_vars or {})

    def loss_fn(params, batch, rng):
        img, mask = batch
        out = model.apply(
            {"params": params, **extra}, img, training=True,
            rngs={"noise": rng},
        )
        res = criterion(out, mask)
        aux = model.apply(
            {"params": params, **extra}, method=model.aux_loss
        )
        return res["loss"] + aux, {**res, "aux_loss": aux}

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return state.apply_gradients(grads), metrics

    return step


def main(argv=None):
    args = base_parser(default_model="stf10", default_lmbda=1.0).parse_args(argv)
    apply_precision(args)

    from icm_tpu.models import create_model
    from icm_tpu.train import SegmentationICMLoss
    from icm_tpu.train.engine import run_training

    model = create_model(args.model, **model_kwargs(args))
    criterion = SegmentationICMLoss(args.lmbda)
    train_batches, eval_batches, init_batch = seg_batch_providers(args)

    run_training(
        model=model,
        criterion=criterion,
        make_step=make_seg_step,
        train_batches=train_batches,
        eval_batches=eval_batches,
        init_batch=(init_batch[0],),
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
        train_patterns=("promot", "student"),
        seed=args.seed,
        save_path=args.save,
        checkpoint=args.checkpoint,
        data_parallel=False,
        make_eval=False,
    )


if __name__ == "__main__":
    main()
