"""Ingest an ACTUAL Detectron2-format .pkl checkpoint (synthesized
fixture — the zero-egress environment ships no pretrained pickles, so
the fixture reproduces the exact on-disk format and key schema of the
model-zoo faster_rcnn_R_50_FPN pickles the reference loads at
fasterRCNN_ICM.py:41-55: a pickled ``{"model": {name: ndarray}}`` with
``backbone.bottom_up.res{L}.{i}.conv{k}(.norm)`` / ``backbone.fpn_*``
keys) and certify the full load -> strip -> convert -> forward path."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

R50_REPS = {2: 3, 3: 4, 4: 6, 5: 3}
WIDTHS = {2: (64, 64, 256), 3: (128, 128, 512), 4: (256, 256, 1024),
          5: (512, 512, 2048)}


def _conv(rng, cout, cin, k):
    return (rng.standard_normal((cout, cin, k, k)) * 0.05).astype(np.float32)


def _norm(rng, c, sd):
    return {
        f"{sd}.norm.weight": rng.standard_normal(c).astype(np.float32),
        f"{sd}.norm.bias": rng.standard_normal(c).astype(np.float32),
        f"{sd}.norm.running_mean": rng.standard_normal(c).astype(np.float32),
        f"{sd}.norm.running_var": (
            np.abs(rng.standard_normal(c)) + 0.5
        ).astype(np.float32),
    }


def make_d2_pkl(path):
    rng = np.random.RandomState(0)
    sd = {}
    bu = "backbone.bottom_up."
    sd[f"{bu}stem.conv1.weight"] = _conv(rng, 64, 3, 7)
    sd.update(_norm(rng, 64, f"{bu}stem.conv1"))
    in_ch = 64
    for res, n in R50_REPS.items():
        w1, w2, w3 = WIDTHS[res]
        for i in range(n):
            blk = f"{bu}res{res}.{i}"
            cin = in_ch if i == 0 else w3
            sd[f"{blk}.conv1.weight"] = _conv(rng, w1, cin, 1)
            sd.update(_norm(rng, w1, f"{blk}.conv1"))
            sd[f"{blk}.conv2.weight"] = _conv(rng, w2, w1, 3)
            sd.update(_norm(rng, w2, f"{blk}.conv2"))
            sd[f"{blk}.conv3.weight"] = _conv(rng, w3, w2, 1)
            sd.update(_norm(rng, w3, f"{blk}.conv3"))
            if i == 0:
                sd[f"{blk}.shortcut.weight"] = _conv(rng, w3, cin, 1)
                sd.update(_norm(rng, w3, f"{blk}.shortcut"))
        in_ch = w3
    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = _conv(rng, 256, cin, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = np.zeros(256, np.float32)
        sd[f"backbone.fpn_output{lvl}.weight"] = _conv(rng, 256, 256, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = np.zeros(256, np.float32)
    with open(path, "wb") as f:
        pickle.dump(
            {"model": sd, "__author__": "synthesized-fixture",
             "matching_heuristics": True},
            f,
        )
    return sd


def test_ingest_detectron2_pkl(tmp_path):
    from icm_tpu.models.icm import _FrozenFPN
    from icm_tpu.utils.torch_weights import (
        convert_detectron2_fpn,
        load_torch_state_dict,
        strip_backbone_prefix,
    )

    path = str(tmp_path / "model_final_synthetic.pkl")
    make_d2_pkl(path)

    sd = load_torch_state_dict(path)
    assert any(k.startswith("backbone.") for k in sd)
    sd = strip_backbone_prefix(sd)  # reference flow, fasterRCNN_ICM.py:49
    variables = convert_detectron2_fpn(sd)

    net = _FrozenFPN()
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)
    )
    # tree-structure certification against a fresh init
    ref_vars = net.init(jax.random.PRNGKey(0), x)
    got = jax.tree_util.tree_structure(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}
    )
    want = jax.tree_util.tree_structure(
        {"params": ref_vars["params"],
         "batch_stats": dict(ref_vars["batch_stats"])}
    )
    assert got == want, "converted tree != _FrozenFPN init tree"

    feats = net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x,
    )
    # FPN pyramid p2..p6 at strides 4..64, 256 channels each
    if isinstance(feats, dict):
        feats = [feats[f"p{i}"] for i in range(2, 7)]
    assert len(feats) == 5
    for j, f in enumerate(feats):
        stride = 4 * 2 ** j
        assert f.shape == (1, 128 // stride, 128 // stride, 256), f.shape
        assert bool(jnp.isfinite(f).all())
