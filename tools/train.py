#!/usr/bin/env python
"""Generic rate-distortion training (reference ``train.py``; default model
stf13 per train.py:296).

Example:
  python tools/train.py -d /data/coco -m cnn --lmbda 0.0067 -e 100
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import apply_precision, base_parser, image_batch_providers, make_visualizer, model_kwargs  # noqa: E402


def main(argv=None):
    args = base_parser(default_model="stf13").parse_args(argv)
    apply_precision(args)

    from icm_tpu.models import create_model
    from icm_tpu.train import RateDistortionLoss, make_train_step
    from icm_tpu.train.engine import run_training

    model = create_model(args.model, **model_kwargs(args))
    criterion = RateDistortionLoss(args.lmbda)
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
        seed=args.seed,
        save_path=args.save,
        checkpoint=args.checkpoint,
        visualizer=make_visualizer(args),
    )


if __name__ == "__main__":
    main()
