"""Forward numerical parity for the WHOLE zoo against the ACTUAL
reference torch code (/root/reference via the reference bridge).

Extends tests/test_reference_parity.py (cnn + stf, incl. bitstream
interchange) to every registry architecture whose reference forward
executes on this host. Each case: build the reference model (seed 0,
eval, scale biases bumped so predicted scales aren't degenerate),
convert its state dict with the zoo converters, run both forwards on the
same image, and require matching x_hat / likelihood bpp. This certifies
converter semantics numerically — tree equality (test_zoo_convert_all)
only proves shapes.

Exclusions, each with the blocking reference fact:
  - oj_ICM / seg_oj_ICM: reference constructors unconditionally load
    Detectron2 configs+weights from absolute paths
    (fasterRCNN_ICM.py:41-55) — Detectron2 is not installed here.
  - stf10: the reference forward crashes unconditionally on its own
    double-g_s1 bug — ``h_hat = self.g_s1(y_hat)`` (384->192) is fed
    BACK through ``self.g_s1`` at stf10.py:1013, a 384-channel conv
    receiving 192 channels. No input reaches the return statement.
  - stf4 runs only via a torch.ones patch: its reference mask creation
    hard-codes device('cuda') (stf4.py:203-206), which raises on a
    CPU-only torch build.
  - cnn2 runs only via a studentNet call adapter (cnn2.py:219 passes one
    arg to the two-arg studentResNet.forward, model.py:384) and returns
    no reconstruction, so its certificate is likelihoods/bpp only.
"""

import os
import sys

import pytest

from icm_tpu.utils.reference_bridge import reference_available

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)
from probe_parity import run  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not present"
    ),
]

# max |x_hat - x_hat_ref| tolerances: conv-transform models sit at 1e-5;
# deep Swin stacks accumulate to ~1e-3 (same budget the certified stf
# test uses, test_reference_parity.py:120). stf2 is EXACT since round 4:
# its former 0.03-0.04 residual was the reference's nn.Unfold
# channel-ordering scramble on the hyper context windows (reproduced by
# masked_ctx._unfold_scramble; localized by tools/probe_stf2_forensics.py
# — the torch-vs-torch eps-control in tools/probe_stf2_control.py showed
# zero rounding flips up to 3e-3 mu noise, ruling out the old
# "boundary flips" explanation).
CASES = {
    "cnn2": 5e-5,
    "stf2": 2e-3,
    "stf3": 2e-3,
    "stf4": 2e-3,
    "stf5": 2e-3,
    "stf6": 2e-3,
    "stf6_2": 2e-3,
    "stf7": 2e-3,
    "stf8": 2e-3,
    "stf9": 5e-5,
    "stf11": 5e-5,
    "stf12": 5e-5,
    "stf13": 5e-5,
    "stf14": 5e-5,
    "czigzag": 2e-3,
}


@pytest.mark.parametrize("arch", sorted(CASES))
def test_forward_parity(arch):
    report = run(arch, size=64)
    assert "error" not in report, report
    assert "shape_mismatch" not in report, report
    if report["max_dx_hat"] is not None:  # cnn2: reference exposes no x_hat
        assert report["max_dx_hat"] < CASES[arch], report
    assert report["bpp_diff"] < 5e-3, report
    # wiring certificate: large likelihood deviations must be localized
    # (AR boundary flips), never broad
    for k, v in report.items():
        if k.startswith("frac_dlik_"):
            assert v < 1e-3, report
