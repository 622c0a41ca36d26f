"""Jitted train/eval steps.

Parity with the reference epoch loop (reference: ``train.py:172-282``):
one step = forward (noise quantization), RD loss backward + clipped main
Adam update, aux quantile loss backward + aux Adam update. Here both
updates come from a single fused backward pass (see ``optim.py``).

TPU-native: the returned step functions are pure and jit/pjit-able; data
parallelism is applied by sharding the batch (see ``icm_tpu/parallel``) —
XLA inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import RateDistortionLoss


def make_train_step(
    model,
    criterion: RateDistortionLoss,
    aux_weight: float = 1.0,
    extra_vars: dict | None = None,
):
    """Returns step(state, batch, rng) -> (state, metrics). ``extra_vars``:
    non-trainable collections (e.g. frozen task-net batch_stats)."""
    extra = dict(extra_vars or {})

    def loss_fn(params, batch, rng):
        # "dropout" serves stochastic-depth/dropout in the transform
        # stacks (stf's DropPath — swin.py); models without those simply
        # never pull it (flax ignores unused rng collections).
        out = model.apply(
            {"params": params, **extra}, batch, training=True,
            rngs={"noise": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        rd = criterion(out, batch)
        aux = model.apply({"params": params, **extra}, method=model.aux_loss)
        total = rd["loss"] + aux_weight * aux
        metrics = {**rd, "aux_loss": aux}
        return total, metrics

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        state = state.apply_gradients(grads)
        return state, metrics

    return step


def make_eval_step(model, criterion: RateDistortionLoss, extra_vars=None):
    extra = dict(extra_vars or {})

    def step(params, batch):
        out = model.apply({"params": params, **extra}, batch, training=False)
        rd = criterion(out, batch)
        psnr = -10.0 * jnp.log10(jnp.mean((out["x_hat"] - batch) ** 2))
        return {**rd, "psnr": psnr}

    return step
