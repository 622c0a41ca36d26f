import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.data import (
    COCOSegmentation,
    CocoDetectionDataset,
    ImageFolder,
    batch_iterator,
    coco_collate,
)
from icm_tpu.data.transforms import pad_to_multiple, resize_min_max_side
from icm_tpu.eval import SegmentationMetric, compute_map, ms_ssim, psnr


@pytest.fixture(scope="module")
def fake_coco(tmp_path_factory):
    """Tiny synthetic COCO directory with 2 images + annotations."""
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(2):
        arr = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
        name = f"img{i}.jpg"
        Image.fromarray(arr).save(root / "val2017" / name)
        images.append(
            {"id": i, "file_name": name, "height": 80, "width": 100}
        )
        anns.append(
            {
                "id": i * 2,
                "image_id": i,
                "category_id": 1,
                "bbox": [10, 10, 30, 20],
                "area": 600,
                "iscrowd": 0,
                "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]],
            }
        )
    cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"}]
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)
    return str(root)


def test_image_folder_and_batches(fake_coco):
    ds = ImageFolder(fake_coco, "val2017")
    assert len(ds) == 2
    img = ds[0]
    assert img.dtype == np.float32 and img.shape == (80, 100, 3)
    batches = list(
        batch_iterator(ds, batch_size=2, shuffle=False, drop_remainder=True)
    )
    assert len(batches) == 1 and batches[0].shape == (2, 80, 100, 3)


def test_coco_detection_dataset(fake_coco):
    ds = CocoDetectionDataset(fake_coco, "val2017")
    assert len(ds) == 2 and ds.num_classes == 2
    s = ds[0]
    assert s["annot"].shape == (1, 5)
    # resized to min side 256 cap 256 -> scale = 256/100 (long side cap)
    assert s["img"].shape[0] <= 256 and s["img"].shape[1] <= 256
    batch = coco_collate([ds[0], ds[1]])
    assert batch["img"].shape[0] == 2
    assert batch["annot"].shape[1] >= 1


def test_coco_segmentation(fake_coco):
    ds = COCOSegmentation(fake_coco, split="val", crop_size=64)
    img, mask = ds[0]
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64)
    # category 1 maps to a VOC class (CAT_LIST contains 1 -> index 15)
    assert mask.max() >= 1


def test_pad_and_resize():
    img = np.zeros((70, 90, 3), np.float32)
    out, orig = pad_to_multiple(img, 64)
    assert out.shape == (128, 128, 3) and orig == (70, 90)
    r, s = resize_min_max_side(img, 256, 256)
    assert max(r.shape[:2]) <= 256


def test_psnr_msssim():
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, 192, 192, 3))
    assert float(psnr(a, a)) > 80
    assert float(ms_ssim(a, a)) > 0.999
    noisy = jnp.clip(a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
    assert float(ms_ssim(a, noisy)) < 0.999
    assert 15 < float(psnr(a, noisy)) < 25


def test_segmentation_metric():
    m = SegmentationMetric(3)
    pred = np.array([[0, 1], [2, 2]])
    label = np.array([[0, 1], [2, 1]])
    m.update(pred, label)
    pix, miou = m.get()
    assert pix == 0.75
    # class0: 1/1, class1: 1/2, class2: 1/2 -> miou = 2/3
    np.testing.assert_allclose(miou, (1 + 0.5 + 0.5) / 3)


def test_compute_map_perfect_and_miss():
    gt = {0: {"boxes": [[0, 0, 10, 10]], "labels": [1]}}
    det_perfect = {
        0: {"boxes": [[0, 0, 10, 10]], "scores": [0.9], "labels": [1]}
    }
    r = compute_map(det_perfect, gt)
    assert r["mAP"] > 0.99
    det_miss = {0: {"boxes": [[50, 50, 60, 60]], "scores": [0.9], "labels": [1]}}
    r2 = compute_map(det_miss, gt)
    assert r2["mAP"] == 0.0


def test_compute_map_full_coco_surface():
    """Per-class AP, area-range AP/AR and AR@k (COCOeval summary set;
    reference analogs retinanet/coco_eval.py + csv_eval.py)."""
    gt = {
        0: {
            "boxes": [[0, 0, 10, 10], [20, 20, 120, 120], [0, 0, 200, 200]],
            "labels": [1, 2, 3],
        },
        1: {"boxes": [[5, 5, 25, 25]], "labels": [1]},
    }
    det = {
        k: {"boxes": v["boxes"], "scores": [1.0] * len(v["labels"]),
            "labels": v["labels"]}
        for k, v in gt.items()
    }
    r = compute_map(det, gt, class_names={1: "cat", 2: "dog", 3: "bus"})
    for key in ("mAP", "AP50", "AP75", "AR1", "AR10", "AR100"):
        assert r[key] == 1.0, (key, r)
    # areas: 100/400 small, 10000/40000 large, nothing medium (-1 like
    # COCOeval's empty-bucket convention)
    assert r["AP_small"] == 1.0 and r["AP_large"] == 1.0
    assert r["AP_medium"] == -1.0 and r["AR_medium"] == -1.0
    assert r["per_class_AP"] == {"cat": 1.0, "dog": 1.0, "bus": 1.0}

    # one of two class-1 gts found: per-class AP ~ 0.5, AR@100 averages
    # recalls {0.5, 0, 0} over the three classes
    det3 = {0: {"boxes": [[0, 0, 10, 10]], "scores": [0.9], "labels": [1]}}
    r3 = compute_map(det3, gt)
    assert abs(r3["per_class_AP"][1] - 0.505) < 1e-2
    assert abs(r3["AR100"] - 0.5 / 3) < 1e-6

    # ignored-area matching: a det on a LARGE gt must not count as a
    # false positive when evaluating the small bucket
    gtp = {0: {"boxes": [[0, 0, 10, 10], [0, 0, 200, 200]], "labels": [1, 1]}}
    detp = {
        0: {
            "boxes": [[0, 0, 10, 10], [0, 0, 200, 200]],
            "scores": [0.8, 0.9],
            "labels": [1, 1],
        }
    }
    rp = compute_map(detp, gtp)
    assert rp["AP_small"] == 1.0, rp


def test_train_config_roundtrip():
    from icm_tpu.config import TrainConfig, ModelConfig

    cfg = TrainConfig(
        model=ModelConfig("cnn", {"N": 16}), lmbda=0.0067, epochs=3
    )
    text = cfg.to_json()
    back = TrainConfig.from_json(text)
    assert back.model.name == "cnn"
    assert back.model.overrides["N"] == 16
    assert back.lmbda == 0.0067


def test_csv_dataset(tmp_path, fake_coco):
    import os
    from icm_tpu.data import CSVDataset

    img = os.path.join(fake_coco, "val2017", "img0.jpg")
    ann = tmp_path / "ann.csv"
    ann.write_text(f"{img},10,10,40,30,person\n{img},5,5,20,20,dog\n")
    cls = tmp_path / "cls.csv"
    cls.write_text("person,0\ndog,1\n")
    ds = CSVDataset(str(ann), str(cls))
    assert len(ds) == 1 and ds.num_classes == 2
    s = ds[0]
    assert s["annot"].shape == (2, 5)


def test_csv_eval_ap_protocol():
    """Reference csv_eval.py semantics: greedy score-order matching at one
    IoU, one GT one match, py-faster-rcnn AP envelope."""
    from icm_tpu.eval import csv_eval_ap

    gts = {
        "a": {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]],
                                np.float32),
              "labels": np.array([0, 0])},
    }
    # perfect: both GT matched -> AP 1
    dets = {
        "a": {"boxes": gts["a"]["boxes"].copy(),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([0, 0])},
    }
    aps = csv_eval_ap(dets, gts, num_classes=2)
    assert aps[0] == (1.0, 2)
    assert aps[1] == (0.0, 0)  # no annotations -> (0, 0) like the reference

    # duplicate detections on one GT: second is a false positive
    dets2 = {
        "a": {"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]],
                                np.float32),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([0, 0])},
    }
    ap, n = csv_eval_ap(dets2, gts, num_classes=1)[0]
    assert n == 2 and 0.0 < ap < 1.0

    # below score threshold -> dropped entirely
    dets3 = {
        "a": {"boxes": gts["a"]["boxes"].copy(),
              "scores": np.array([0.01, 0.01]),
              "labels": np.array([0, 0])},
    }
    assert csv_eval_ap(dets3, gts, num_classes=1)[0] == (0.0, 2)
