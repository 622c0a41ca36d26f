"""End-to-end CLI smoke tests: tiny synthetic dataset, 1-2 epochs."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


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


TINY_TASKS = json.dumps(
    dict(
        N=16, M=24, mid=32, num_slices=2, max_support=4, support_num=8,
        hyper_enc_widths=[24, 20, 16, 14, 12],
        hyper_dec_widths=[14, 16, 20, 24, 24],
        cc_widths=[20, 12],
    )
)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(2):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "val2017" / f"im{i}.jpg")
        images.append(
            {"id": i, "file_name": f"im{i}.jpg", "height": 64, "width": 64}
        )
        anns.append(
            {
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [8, 8, 24, 16], "area": 384, "iscrowd": 0,
                "segmentation": [[8, 8, 32, 8, 32, 24, 8, 24]],
            }
        )
    cats = [{"id": 1, "name": "person"}]
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(
            {"images": images, "annotations": anns, "categories": cats}, f
        )
    return str(root)


def test_eval_cli_detection_mode(coco_root):
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    kw = json.loads(TINY_CNN)
    kw.update(num_classes=3, task_block="basic", task_layers=[1, 1, 1, 1])
    res = main(
        [
            "detection", "-d", coco_root, "-m", "cnn2",
            "--model-kwargs", json.dumps(kw), "--max-images", "1",
        ]
    )
    # full COCOeval surface (per-class AP, area buckets, AR@k)
    for key in ("mAP", "AP50", "AP75", "AP_small", "AP_large",
                "AR1", "AR10", "AR100", "per_class_AP"):
        assert key in res, sorted(res)


def test_eval_cli_segmentation_mode(coco_root):
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    kw = json.loads(TINY_TASKS)
    kw.update(num_seg_classes=5, task_backbone="resnet18")
    res = main(
        [
            "segmentation", "-d", coco_root, "-m", "stf10",
            "--model-kwargs", json.dumps(kw), "--max-images", "1",
        ]
    )
    assert 0.0 <= res["mIoU"] <= 1.0


def test_recovery_wrapper_resumes(tmp_path, image_root):
    """run_training_with_recovery restarts from the checkpoint after a
    mid-training crash."""
    import jax

    from icm_tpu.models import WACNN
    from icm_tpu.train import RateDistortionLoss, make_train_step
    from icm_tpu.train.engine import run_training_with_recovery

    model = WACNN(**json.loads(TINY_CNN))
    save = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def train_batches(epoch):
        from icm_tpu.data import ImageFolder, batch_iterator
        from icm_tpu.data.transforms import center_crop

        ds = ImageFolder(image_root, "train", lambda im: center_crop(im, (64, 64)))
        calls["n"] += 1
        if calls["n"] == 2:  # crash during the 2nd epoch's pipeline
            raise RuntimeError("injected failure")
        yield from batch_iterator(ds, 2, shuffle=False, epochs=1)

    def eval_batches():
        return iter(())

    init_batch = next(iter(train_batches(0)))
    calls["n"] = 0
    _, history = run_training_with_recovery(
        max_retries=1,
        model=model,
        criterion=RateDistortionLoss(0.01),
        make_step=make_train_step,
        train_batches=train_batches,
        eval_batches=eval_batches,
        init_batch=init_batch,
        epochs=3,
        save_path=save,
        make_eval=False,
    )
    assert len(history) >= 1


def test_train_oj_cli_smoke(image_root, tmp_path):
    sys.path.insert(0, os.getcwd())
    from tools.train_oj import main

    kw = json.loads(TINY_TASKS)
    kw.update(task_layers=[1, 1, 1, 1])
    main(
        [
            "-d", image_root, "--model-kwargs", json.dumps(kw),
            "-e", "1", "--batch-size", "2", "--test-batch-size", "2",
            "--patch-size", "64", "64", "--steps-per-epoch", "1",
            "--save", str(tmp_path / "oj"),
        ]
    )
    assert os.path.exists(str(tmp_path / "oj"))


def test_train_seg_oj_cli_smoke(image_root, tmp_path):
    sys.path.insert(0, os.getcwd())
    from tools.train_seg_oj import main

    kw = json.loads(TINY_TASKS)
    kw.update(task_layers=[1, 1, 1, 1])
    main(
        [
            "-d", image_root, "--model-kwargs", json.dumps(kw),
            "-e", "1", "--batch-size", "2", "--test-batch-size", "2",
            "--patch-size", "64", "64", "--steps-per-epoch", "1",
            "--save", str(tmp_path / "segoj"),
        ]
    )
    assert os.path.exists(str(tmp_path / "segoj"))


def test_eval_cli_detection_real_coder(coco_root):
    """Bitstream-level mAP: detections computed on the actual
    compress->decompress reconstruction (--real-coder)."""
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    kw = json.loads(TINY_CNN)
    kw.update(num_classes=3, task_block="basic", task_layers=[1, 1, 1, 1])
    res = main(
        [
            "detection", "-d", coco_root, "-m", "cnn2", "--real-coder",
            "--model-kwargs", json.dumps(kw), "--max-images", "1",
        ]
    )
    assert res["bpp"] > 0
    assert {"mAP", "AP50", "AP75"} <= set(res)


def test_eval_cli_segmentation_real_coder(coco_root):
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    kw = json.loads(TINY_TASKS)
    kw.update(num_seg_classes=5, task_backbone="resnet18")
    res = main(
        [
            "segmentation", "-d", coco_root, "-m", "stf10", "--real-coder",
            "--model-kwargs", json.dumps(kw), "--max-images", "1",
        ]
    )
    assert res["bpp"] > 0
    assert 0.0 <= res["mIoU"] <= 1.0


def test_eval_cli_torch_checkpoint(image_root, tmp_path):
    """--torch-checkpoint: a reference .pth converts in place and drives
    the eval (entropy estimation on the full-size WACNN)."""
    from icm_tpu.utils.reference_bridge import reference_available

    if not reference_available():
        pytest.skip("reference tree not present")
    import torch

    from icm_tpu.utils.reference_bridge import ref_wacnn

    torch.manual_seed(0)
    ckpt = str(tmp_path / "ref_wacnn.pth")
    torch.save(ref_wacnn().state_dict(), ckpt)

    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    res = main(
        [
            "image", "-d", image_root, "--split", "test", "-m", "cnn",
            "--torch-checkpoint", ckpt, "--entropy-estimation",
            "--max-images", "1",
        ]
    )
    assert np.isfinite(res["bpp"]) and res["bpp"] > 0
    assert np.isfinite(res["psnr"])


def test_train_cli_bf16(image_root, tmp_path):
    """--bf16: transforms train in bf16 activations end-to-end."""
    sys.path.insert(0, os.getcwd())
    from tools.train import main

    from icm_tpu.nn import set_activation_dtype

    try:
        main(
            [
                "-d", image_root, "-m", "cnn", "--model-kwargs", TINY_CNN,
                "-e", "1", "--batch-size", "2", "--test-batch-size", "2",
                "--patch-size", "64", "64", "--steps-per-epoch", "2",
                "--save", str(tmp_path / "bf16ck"), "--bf16",
            ]
        )
    finally:
        set_activation_dtype(None)
    assert os.path.exists(str(tmp_path / "bf16ck"))


def test_eval_stf3_auto_causal():
    """The eval CLI builds stf4 with causal=True when a real coder is
    requested (its reference mask degenerates at token 0); stf3 keeps
    the reference default — its internal block mask is already causal
    and Stf3Codec drives it directly."""
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import parse_args, resolve_model_kwargs

    from icm_tpu.models import create_model

    tiny = json.dumps(dict(
        embed_dim=8, depths=[1, 1], num_heads=[1, 2], window_size=4,
        patch_size=2, drop_path_rate=0.0, num_slices=4, mask_win_size=2,
        hyper_enc_widths=[16, 14, 12, 10, 8],
        hyper_dec_widths=[10, 12, 14, 16, 16],
    ))
    for name, flags, expect_causal in [
        ("stf4", [], True),                          # degenerate ref mask
        ("stf4", ["--entropy-estimation"], False),   # forward = ref exact
        ("stf3", [], False),                         # ref mask already causal
        ("stf3", ["--entropy-estimation"], False),
    ]:
        args = parse_args(
            ["image", "-d", "/tmp", "-m", name, "--model-kwargs", tiny]
            + flags
        )
        model = create_model(args.model, **resolve_model_kwargs(args))
        assert bool(getattr(model, "causal", False)) is expect_causal, (
            name, flags
        )


def test_eval_cli_detection_csv(coco_root, tmp_path):
    """Reference csv_eval.py:152-259 protocol wired through the CLI:
    per-class AP over a CSVDataset."""
    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    img0 = os.path.join(coco_root, "val2017", "im0.jpg")
    ann = tmp_path / "ann.csv"
    ann.write_text(f"{img0},10,10,40,30,person\n")
    cls = tmp_path / "cls.csv"
    cls.write_text("person,0\ndog,1\n")
    kw = json.loads(TINY_CNN)
    kw.update(num_classes=2, task_block="basic", task_layers=[1, 1, 1, 1])
    res = main(
        [
            "detection", "-d", str(ann), "-m", "cnn2",
            "--dataset-type", "csv", "--class-list", str(cls),
            "--csv-min-side", "64", "--csv-max-side", "64",
            "--model-kwargs", json.dumps(kw),
        ]
    )
    assert set(res["per_class_AP"]) == {"person", "dog"}
    assert 0.0 <= res["mAP"] <= 1.0


def test_eval_cli_image_czigzag_pair_dir(image_root):
    """czigzag image mode through the real CzigzagCodec, pair conditioning
    from --pair-dir (reference datasets/utils.py:92-157 convention)."""
    import shutil

    sys.path.insert(0, os.getcwd())
    from tools.eval_model import main

    pair_dir = os.path.join(image_root, "up_x4")
    os.makedirs(pair_dir, exist_ok=True)
    test_dir = os.path.join(image_root, "test")
    for name in os.listdir(test_dir):
        shutil.copy(os.path.join(test_dir, name),
                    os.path.join(pair_dir, name))
    kw = dict(
        embed_dim=8, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
        window_size=4, patch_size=2, drop_path_rate=0.0,
        num_slices=2, max_support=3, support_num=3,
        hyper_depths=[1, 1], cc_widths=[24, 16],
    )
    res = main(
        [
            "image", "-d", image_root, "--split", "test",
            "-m", "czigzag", "--pair-dir", "up_x4",
            "--model-kwargs", json.dumps(kw), "--max-images", "1",
        ]
    )
    assert res["bpp"] > 0 and res["enc_time"] > 0 and res["dec_time"] > 0


def test_eval_cli_image_mode_scan_wire(image_root, capsys):
    """image mode over the TPU-native wire: --scan-wire routes the cnn
    codec through DeviceWireCodec(scan_wire=True) end-to-end."""
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
            "--scan-wire",
        ]
    )
    assert agg["bpp"] > 0 and np.isfinite(agg["psnr"])
