"""Checkpoint conversion coverage for every zoo architecture.

Each test instantiates the ACTUAL reference torch model (through the
reference bridge), converts its real state dict, and asserts exact tree
equality (names + shapes) with the flax model's init tree — certifying
``load_reference_checkpoint`` works for all 19 registry names
(reference ``zoo/__init__.py:23-43``). The two Detectron2-dependent
models (whose reference classes cannot be instantiated without their
external config/pickles) use state dicts built from the reference's own
``baseLayer`` factories with the exact fasterRCNN_ICM.py:62-85 wiring.
"""

import gc

import numpy as np
import pytest

from icm_tpu.utils.reference_bridge import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not present"
    ),
]


def _specs(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_specs(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def _ref_state_dict(module_name, class_name):
    import importlib

    import torch

    from icm_tpu.utils.reference_bridge import load_reference

    load_reference()
    cls = getattr(
        importlib.import_module(f"compressai.models.{module_name}"),
        class_name,
    )
    torch.manual_seed(0)
    ref = cls()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    gc.collect()
    return sd


def _assert_converted_matches(arch, sd, model, init_args=None, rngs=None):
    import jax
    import jax.numpy as jnp

    from icm_tpu.zoo import convert_reference_state_dict

    converted = convert_reference_state_dict(arch, sd)
    stats = None
    if isinstance(converted, dict) and set(converted) == {
        "params", "batch_stats",
    }:
        stats = converted["batch_stats"]
        converted = converted["params"]

    init_args = init_args or (jnp.zeros((1, 64, 64, 3)),)
    rngs = rngs or {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    v = jax.eval_shape(lambda: model.init(rngs, *init_args))
    want, got = _specs(v["params"]), _specs(converted)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    wrong = [(k, want[k], got[k]) for k in want if k in got and want[k] != got[k]]
    assert not (missing or extra or wrong), (
        missing[:8], extra[:8], wrong[:5],
    )
    if stats is not None and "batch_stats" in v:
        assert _specs(v["batch_stats"]) == _specs(stats)
    del converted
    gc.collect()


REF_CLASSES = {
    "stf2": ("stf2", "ClipEncoder"),
    "stf3": ("stf3", "ClipEncoder3"),
    "stf4": ("stf4", "ClipEncoder4"),
    "stf5": ("stf5", "SymmetricalTransFormer2"),
    "stf6": ("stf6", "SymmetricalTransFormer3"),
    "stf7": ("stf7", "SymmetricalTransFormer4"),
    "stf8": ("stf8", "SymmetricalTransFormer5"),
    "stf9": ("stf9", "SymmetricalTransFormer6"),
    "stf11": ("stf11", "ConditionalResidualCoding"),
    "stf12": ("stf12", "ConditionalResidualCoding2"),
    "stf13": ("stf13", "ConditionalResidualCoding3"),
    "stf14": ("stf14", "ResidualCoding"),
    "czigzag": ("czigzag", "conditionalZigzag"),
}


@pytest.mark.parametrize("arch", sorted(REF_CLASSES))
def test_convert_real_reference_state_dict(arch):
    import jax
    import jax.numpy as jnp

    from icm_tpu.models import create_model

    sd = _ref_state_dict(*REF_CLASSES[arch])
    model = create_model(arch)
    args = (jnp.zeros((1, 64, 64, 3)),)
    if arch == "czigzag":
        args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    _assert_converted_matches(arch, sd, model, init_args=args)
    del sd
    gc.collect()


def test_convert_cnn2():
    from icm_tpu.models import create_model

    sd = _ref_state_dict("cnn2", "WACNN2")
    _assert_converted_matches("cnn2", sd, create_model("cnn2"))


def test_convert_stf10():
    from icm_tpu.models import create_model
    from icm_tpu.utils.reference_bridge import ref_stf10

    ref = ref_stf10()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    gc.collect()
    _assert_converted_matches(
        "stf10", sd, create_model("stf10", with_task_net=False)
    )


def _fake_oj_state_dict(seg: bool):
    """fasterRCNN_ICM.py:62-85 codec wiring, built from the reference's
    own baseLayer factories (the class itself needs Detectron2 + external
    pickles)."""
    import torch
    import torch.nn as nn

    from icm_tpu.utils.reference_bridge import load_reference

    load_reference()
    from compressai.entropy_models import (
        EntropyBottleneck,
        GaussianConditional,
    )
    from compressai.models.baseLayer import (
        CRC_two_mainCNNencoder,
        hyperContextLRP,
        hyperContextMean,
        hyperEncoder,
        hyperMean,
        mainCNNdecoder,
        mainCNNencoder,
    )

    class FakeOj(nn.Module):
        def __init__(self):
            super().__init__()
            N, M, num_slices, number = 192, 384, 2, 2
            self.g_a = mainCNNencoder(N, M)
            self.g_s = mainCNNdecoder(N, M)
            self.h_a = hyperEncoder()
            self.h_mean_s = hyperMean()
            self.h_scale_s = hyperMean()
            self.cc_mean_transforms2 = hyperContextMean(8, num_slices, 4, number)
            self.cc_scale_transforms2 = hyperContextMean(8, num_slices, 4, number)
            self.lrp_transforms2 = hyperContextLRP(8, num_slices, 4, number)
            self.entropy_bottleneck = EntropyBottleneck(192)
            self.gaussian_conditional = GaussianConditional(None)
            if seg:
                self.seg_g_a = CRC_two_mainCNNencoder(N, M)
                self.seg_g_s = mainCNNdecoder(N, M)
                self.seg_h_a = hyperEncoder()
                self.seg_h_mean_s = hyperMean()
                self.seg_h_scale_s = hyperMean()
                self.seg_cc_mean_transforms2 = hyperContextMean(
                    8, num_slices, 4, number
                )
                self.seg_cc_scale_transforms2 = hyperContextMean(
                    8, num_slices, 4, number
                )
                self.seg_lrp_transforms2 = hyperContextLRP(
                    8, num_slices, 4, number
                )
                self.seg_entropy_bottleneck = EntropyBottleneck(192)
                self.seg_gaussian_conditional = GaussianConditional(None)

    torch.manual_seed(0)
    fake = FakeOj()
    sd = {k: v.detach().numpy() for k, v in fake.state_dict().items()}
    del fake
    gc.collect()
    return sd


@pytest.mark.parametrize("arch", ["oj_ICM", "seg_oj_ICM"])
def test_convert_oj_icm(arch):
    from icm_tpu.models import create_model

    sd = _fake_oj_state_dict(seg=arch == "seg_oj_ICM")
    _assert_converted_matches(
        arch, sd, create_model(arch, with_task_net=False)
    )
