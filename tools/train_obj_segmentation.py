#!/usr/bin/env python
"""3-layer CRC segmentation-stage training (reference
``train_obj_segmentation.py``): model stf13, only the ``seg*`` parameters
train (reference train_obj_segmentation.py:121: TrainList=['seg']); loss =
lambda*CE(seg student output, mask) + 0.1*bpp when a seg student is
attached, otherwise RD on the segmentation layer reconstruction."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import apply_precision, base_parser, image_batch_providers, model_kwargs  # noqa: E402


def main(argv=None):
    args = base_parser(default_model="stf13", default_lmbda=1.0).parse_args(argv)
    apply_precision(args)

    from icm_tpu.models import create_model
    from icm_tpu.train import RateDistortionLoss, make_train_step
    from icm_tpu.train.engine import run_training

    model = create_model(args.model, **model_kwargs(args))
    # seg-stage RD objective over the seg layer's likelihood group
    criterion = RateDistortionLoss(
        args.lmbda, likelihood_keys=("seg_likelihoods",)
    )
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
        train_patterns=("seg",),
        seed=args.seed,
        save_path=args.save,
        checkpoint=args.checkpoint,
    )


if __name__ == "__main__":
    main()
