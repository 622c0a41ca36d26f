"""OpenImages dataset loader tests."""


def test_openimages_dataset(tmp_path):
    import csv as _csv

    import numpy as np

    from icm_tpu.data import OpenImagesDataset, coco_collate

    root = tmp_path / "oid"
    imgs = root / "images" / "validation"
    meta = root / "annotations" / "validation"
    imgs.mkdir(parents=True)
    meta.mkdir(parents=True)
    with open(root / "annotations" / "class-descriptions-boxable.csv",
              "w", newline="") as f:
        _csv.writer(f).writerows([["/m/01", "Cat"], ["/m/02", "Dog"]])
    from PIL import Image
    Image.new("RGB", (40, 20), (120, 40, 200)).save(imgs / "imgA.jpg")
    Image.new("RGB", (30, 30), (10, 90, 50)).save(imgs / "imgB.jpg")
    cols = ["ImageID", "Source", "LabelName", "Confidence",
            "XMin", "XMax", "YMin", "YMax"]
    rows = [
        ["imgA", "x", "/m/01", "1", "0.1", "0.5", "0.2", "0.8"],
        ["imgA", "x", "/m/02", "1", "0.5", "0.9", "0.1", "0.6"],
        ["imgA", "x", "/m/01", "1", "0.40", "0.41", "0.5", "0.5"],  # degenerate
        ["imgB", "x", "/m/02", "1", "0.0", "1.0", "0.0", "1.0"],
        ["imgC", "x", "/m/01", "1", "0.0", "1.0", "0.0", "1.0"],  # missing img
        ["imgA", "x", "/m/99", "1", "0.0", "1.0", "0.0", "1.0"],  # unknown cls
    ]
    with open(meta / "validation-annotations-bbox.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(cols)
        w.writerows(rows)

    ds = OpenImagesDataset(str(root), "validation")
    assert len(ds) == 2 and ds.num_classes == 2
    sA = ds[0]
    assert sA["img"].shape == (20, 40, 3)
    np.testing.assert_allclose(
        sA["annot"], [[4, 4, 20, 16, 0], [20, 2, 36, 12, 1]]
    )
    assert ds[1]["annot"].shape == (1, 5)
    # JSON cache written and reused
    assert (root / "oid_validation.json").exists()
    ds2 = OpenImagesDataset(str(root), "validation")
    assert len(ds2) == 2
    batch = coco_collate([ds[0], ds[1]])
    assert batch["img"].shape[0] == 2
