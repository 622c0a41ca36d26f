#!/usr/bin/env python
"""Detection+segmentation ICM training (reference ``train_seg_oj.py``):
model seg_oj_ICM, same distillation loss, but only the ``seg*`` parameters
train (reference train_seg_oj.py:149)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import apply_precision, base_parser, image_batch_providers, model_kwargs  # noqa: E402


def main(argv=None):
    args = base_parser(default_model="seg_oj_ICM", default_lmbda=1.0).parse_args(argv)
    apply_precision(args)

    from icm_tpu.models import create_model
    from icm_tpu.train import DetectionICMLoss, make_train_step
    from icm_tpu.train.engine import run_training

    model = create_model(args.model, **model_kwargs(args))
    criterion = DetectionICMLoss(args.lmbda)
    train_batches, eval_batches, init_batch = image_batch_providers(args)

    run_training(
        model=model,
        criterion=criterion,
        make_step=make_train_step,
        train_batches=train_batches,
        eval_batches=eval_batches,
        init_batch=init_batch,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
        freeze_patterns=("task_net",),
        train_patterns=("seg",),
        seed=args.seed,
        save_path=args.save,
        checkpoint=args.checkpoint,
    )


if __name__ == "__main__":
    main()
