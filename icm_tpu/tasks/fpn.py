"""Feature pyramid networks.

- ``PyramidFeatures``: RetinaNet-style P3-P7 (reference:
  ``compressai/models/retinanet/model.py:19-65``): lateral 1x1 + top-down
  nearest upsample + 3x3 output convs; P6 = stride-2 conv on C5; P7 =
  ReLU + stride-2 conv on P6.
- ``FPN``: Detectron2-style P2-P6 used as the frozen R50-FPN task net in
  the ICM codecs (reference: ``fasterRCNN_ICM.py:41-55`` loading
  ``build_resnet_fpn_backbone`` with LastLevelMaxPool): lateral 1x1 +
  output 3x3 per level, P6 = max-pool of P5. Feature dict keys p2..p6.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest(x, factor: int = 2):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, factor, W, factor, C)
    )
    return x.reshape(B, H * factor, W * factor, C)


class PyramidFeatures(nn.Module):
    feature_size: int = 256

    @nn.compact
    def __call__(self, inputs: Sequence):
        C3, C4, C5 = inputs
        fs = self.feature_size

        P5_x = nn.Conv(fs, (1, 1), name="P5_1")(C5)
        P5_up = _upsample_nearest(P5_x)
        P5_x = nn.Conv(fs, (3, 3), padding=((1, 1), (1, 1)), name="P5_2")(P5_x)

        P4_x = nn.Conv(fs, (1, 1), name="P4_1")(C4) + P5_up
        P4_up = _upsample_nearest(P4_x)
        P4_x = nn.Conv(fs, (3, 3), padding=((1, 1), (1, 1)), name="P4_2")(P4_x)

        P3_x = nn.Conv(fs, (1, 1), name="P3_1")(C3) + P4_up
        P3_x = nn.Conv(fs, (3, 3), padding=((1, 1), (1, 1)), name="P3_2")(P3_x)

        P6_x = nn.Conv(
            fs, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="P6"
        )(C5)
        P7_x = nn.Conv(
            fs, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="P7_2"
        )(nn.relu(P6_x))
        return [P3_x, P4_x, P5_x, P6_x, P7_x]


class FPN(nn.Module):
    """Detectron2-style P2-P6 pyramid over (C2, C3, C4, C5)."""

    feature_size: int = 256

    @nn.compact
    def __call__(self, inputs: Sequence):
        C2, C3, C4, C5 = inputs
        fs = self.feature_size

        laterals = [
            nn.Conv(fs, (1, 1), name=f"lateral{i + 2}")(c)
            for i, c in enumerate((C2, C3, C4, C5))
        ]
        # top-down
        tds = [laterals[3]]
        for i in (2, 1, 0):
            tds.insert(0, laterals[i] + _upsample_nearest(tds[0]))
        outs = {
            f"p{i + 2}": nn.Conv(
                fs, (3, 3), padding=((1, 1), (1, 1)), name=f"output{i + 2}"
            )(t)
            for i, t in enumerate(tds)
        }
        outs["p6"] = nn.max_pool(
            outs["p5"], (1, 1), strides=(2, 2), padding="VALID"
        )
        return outs
