"""File-based visualizer (utils/visualizer.py): the zero-egress analog
of the reference's visdom dashboard (deeplab/high_utils/visualizer.py)."""

import json
import os

import numpy as np
from PIL import Image

from icm_tpu.utils.visualizer import Visualizer


def test_scalar_append_and_id_prefix(tmp_path):
    v = Visualizer(logdir=str(tmp_path), env="main", id="7")
    v.vis_scalar("Loss", 1, 2.5)
    v.vis_scalar("Loss", [2, 3], [2.0, 1.5])  # list form, like the reference
    rows = [
        json.loads(line)
        for line in open(tmp_path / "main" / "_7_Loss.jsonl")
    ]
    assert [r["x"] for r in rows] == [1.0, 2.0, 3.0]
    assert [r["y"] for r in rows] == [2.5, 2.0, 1.5]


def test_image_accepts_chw_float_and_hwc_uint8(tmp_path):
    v = Visualizer(logdir=str(tmp_path))
    p1 = v.vis_image("chw", np.random.rand(3, 8, 10))
    p2 = v.vis_image("hwc", np.zeros((8, 10, 3), np.uint8))
    assert Image.open(p1).size == (10, 8)
    assert Image.open(p2).size == (10, 8)


def test_table_roundtrips(tmp_path):
    v = Visualizer(logdir=str(tmp_path))
    p = v.vis_table("opts", {"lr": 1e-4, "momentum": 0.9})
    assert json.load(open(p)) == {"lr": 1e-4, "momentum": 0.9}


def test_segmentation_panel_layout(tmp_path):
    v = Visualizer(logdir=str(tmp_path))
    p = v.vis_segmentation(
        "val0",
        np.random.rand(16, 16, 3),
        np.random.randint(0, 21, (16, 16)),
        np.random.randint(0, 21, (16, 16)),
    )
    img = Image.open(p)
    assert img.size == (16 * 3 + 2 * 4, 16)  # three tiles + two separators


def test_engine_hook_writes_curves(tmp_path):
    """run_training(visualizer=...) appends per-epoch curves."""
    import jax
    import jax.numpy as jnp

    from icm_tpu.models import WACNN
    from icm_tpu.train import RateDistortionLoss, make_train_step
    from icm_tpu.train.engine import run_training

    tiny = dict(
        N=16, M=24, num_slices=6, max_support_slices=5,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(12, 14, 16, 20, 24),
        cc_widths=(16, 12, 10, 8),
    )
    x = np.random.rand(2, 64, 64, 3).astype(np.float32)
    v = Visualizer(logdir=str(tmp_path), env="tiny")
    run_training(
        model=WACNN(**tiny),
        criterion=RateDistortionLoss(0.01),
        make_step=make_train_step,
        train_batches=lambda e: iter([jnp.asarray(x)]),
        eval_batches=lambda: iter([jnp.asarray(x)]),
        init_batch=jnp.asarray(x),
        epochs=2,
        data_parallel=False,
        visualizer=v,
    )
    for name in ("train_loss", "test_loss", "lr", "epoch_seconds"):
        rows = [
            json.loads(line) for line in open(tmp_path / "tiny" / f"{name}.jsonl")
        ]
        assert len(rows) == 2, name
