"""End-to-end CLI smoke tests: tiny synthetic dataset, 1-2 epochs."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        (root / split).mkdir()
        for i in range(4):
            arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / split / f"{i}.png")
    return str(root)


TINY_CNN = json.dumps(
    dict(
        N=16,
        M=24,
        num_slices=6,
        max_support_slices=5,
        hyper_enc_widths=[24, 20, 16, 14, 12],
        hyper_dec_widths=[12, 14, 16, 20, 24],
        cc_widths=[16, 12, 10, 8],
    )
)


def test_train_cli_runs_and_checkpoints(image_root, tmp_path, capsys):
    sys.path.insert(0, os.getcwd())
    from tools.train import main

    save = str(tmp_path / "ckpt")
    main(
        [
            "-d", image_root,
            "-m", "cnn",
            "--model-kwargs", TINY_CNN,
            "-e", "2",
            "--batch-size", "2",
            "--test-batch-size", "2",
            "--patch-size", "64", "64",
            "--steps-per-epoch", "2",
            "--save", save,
        ]
    )
    out = capsys.readouterr().out
    assert "epoch 0" in out and "epoch 1" in out
    assert os.path.exists(save)

    # resume from the checkpoint
    main(
        [
            "-d", image_root,
            "-m", "cnn",
            "--model-kwargs", TINY_CNN,
            "-e", "3",
            "--batch-size", "2",
            "--test-batch-size", "2",
            "--patch-size", "64", "64",
            "--steps-per-epoch", "1",
            "--save", str(tmp_path / "ckpt2"),
            "--checkpoint", save,
        ]
    )
    out = capsys.readouterr().out
    assert "resumed" in out and "epoch 2" in out


def test_eval_cli_image_mode(image_root, capsys):
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    agg = main(
        [
            "image",
            "-d", image_root,
            "--split", "test",
            "-m", "cnn",
            "--model-kwargs", TINY_CNN,
            "--max-images", "1",
        ]
    )
    assert agg["bpp"] > 0 and np.isfinite(agg["psnr"])
    out = capsys.readouterr().out
    assert "average:" in out
