"""Rate-distortion losses.

Parity with the reference ``RateDistortionLoss`` (reference:
``train.py:44-76``): ``loss = lambda * 255^2 * MSE(x, x_hat) + bpp`` with
``bpp = sum(-log2 likelihoods) / num_pixels`` over all likelihood tensors.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def compute_bpp(likelihoods: dict, num_pixels: int):
    """bpp from a dict of likelihood tensors."""
    total = 0.0
    for lik in likelihoods.values():
        total = total + jnp.sum(jnp.log(lik))
    return -total / (math.log(2) * num_pixels)


class RateDistortionLoss:
    def __init__(self, lmbda: float = 1e-2, likelihood_keys=("likelihoods",)):
        self.lmbda = float(lmbda)
        self.likelihood_keys = tuple(likelihood_keys)

    def _bpp(self, output: dict, num_pixels: int):
        bpp = 0.0
        for k in self.likelihood_keys:
            if k in output and output[k] is not None:
                bpp = bpp + compute_bpp(output[k], num_pixels)
        return bpp

    def __call__(self, output: dict, target):
        B, H, W, _ = target.shape
        num_pixels = B * H * W
        bpp_loss = self._bpp(output, num_pixels)
        mse_loss = jnp.mean(
            (output["x_hat"].astype(jnp.float32) - target) ** 2
        )
        loss = self.lmbda * 255 ** 2 * mse_loss + bpp_loss
        return {
            "loss": loss,
            "bpp_loss": bpp_loss,
            "mse_loss": mse_loss,
        }


class DetectionICMLoss(RateDistortionLoss):
    """Feature-distillation ICM loss (reference ``train_oj.py:49-92``):
    ``1000*MSE(x, x_hat) + 100*sum_{p2..p6} MSE(student, teacher) +
    lambda*bpp``."""

    def __call__(self, output: dict, target):
        B, H, W, _ = target.shape
        num_pixels = B * H * W
        bpp_loss = self._bpp(output, num_pixels)
        mse_loss = jnp.mean(
            (output["decompressedImage"].astype(jnp.float32) - target) ** 2
        )
        t = output["Teacher_output_features"]
        s = output["Student_output_features"]
        feature_loss = sum(
            jnp.mean((s[k] - jax.lax.stop_gradient(t[k])) ** 2) for k in t
        )
        loss = 1000.0 * mse_loss + 100.0 * feature_loss + self.lmbda * bpp_loss
        return {
            "loss": loss,
            "bpp_loss": bpp_loss,
            "mse_loss": mse_loss,
            "feature_loss": feature_loss,
        }


class SegmentationICMLoss(RateDistortionLoss):
    """Segmentation ICM loss (reference ``train_segmentation.py:55-76``):
    ``lambda*CE(student_out, mask) + 0.1*bpp`` (ignore label < 0)."""

    def __call__(self, output: dict, target_mask):
        logits = output["Student_output"]
        B, H, W, K = logits.shape
        num_pixels = B * H * W
        bpp_loss = self._bpp(output, num_pixels)
        valid = target_mask >= 0
        labels = jnp.clip(target_mask, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        ce_loss = jnp.where(valid, ce, 0.0).sum() / jnp.clip(valid.sum(), 1)
        loss = self.lmbda * ce_loss + 0.1 * bpp_loss
        return {"loss": loss, "bpp_loss": bpp_loss, "ce_loss": ce_loss}
