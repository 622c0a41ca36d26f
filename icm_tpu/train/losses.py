"""Rate-distortion losses.

Parity with the reference ``RateDistortionLoss`` (reference:
``train.py:44-76``): ``loss = lambda * 255^2 * MSE(x, x_hat) + bpp`` with
``bpp = sum(-log2 likelihoods) / num_pixels`` over all likelihood tensors.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def compute_bpp(likelihoods: dict, num_pixels: int):
    """bpp from a dict of likelihood tensors."""
    total = 0.0
    for lik in likelihoods.values():
        total = total + jnp.sum(jnp.log(lik))
    return -total / (math.log(2) * num_pixels)


class RateDistortionLoss:
    def __init__(self, lmbda: float = 1e-2):
        self.lmbda = float(lmbda)

    def __call__(self, output: dict, target):
        B, H, W, _ = target.shape
        num_pixels = B * H * W
        bpp_loss = compute_bpp(output["likelihoods"], num_pixels)
        mse_loss = jnp.mean((output["x_hat"] - target) ** 2)
        loss = self.lmbda * 255 ** 2 * mse_loss + bpp_loss
        return {
            "loss": loss,
            "bpp_loss": bpp_loss,
            "mse_loss": mse_loss,
        }
