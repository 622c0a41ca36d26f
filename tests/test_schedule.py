"""LR schedulers match the torch semantics the reference relies on
(reference train.py:444,506 uses torch ReduceLROnPlateau defaults;
deeplab/high_utils/scheduler.py:3-13 defines PolyLR)."""

import numpy as np
import pytest

from icm_tpu.train.schedule import PolyLR, ReduceLROnPlateau


def _torch_plateau_lrs(metrics, lr, **kw):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min", **kw)
    lrs = []
    for m in metrics:
        sched.step(m)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"patience": 2, "factor": 0.5},
        {"patience": 1, "cooldown": 2, "factor": 0.5},
        {"patience": 0, "threshold": 0.1, "factor": 0.5, "min_lr": 0.02},
    ],
)
def test_reduce_lr_on_plateau_matches_torch(kw):
    rng = np.random.RandomState(0)
    # mostly-plateauing metric sequence with occasional improvements
    metrics = list(np.cumsum(rng.rand(40) - 0.2)[::-1] + 10.0)
    ours = ReduceLROnPlateau(0.1, **kw)
    got = [ours.step(m) for m in metrics]
    want = _torch_plateau_lrs(metrics, 0.1, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_poly_lr_endpoints():
    s = PolyLR(0.01, max_steps=100, power=0.9)
    assert s(0) == 0.01
    assert s(100) == 0.0
    assert 0 < s(50) < 0.01
