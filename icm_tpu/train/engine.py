"""Shared training engine behind the six CLI entry points.

Parity with the reference training skeleton (reference ``train.py:
172-527`` and its five siblings): loss -> dual optimizers -> epoch loop
with per-step logging -> test epoch -> ReduceLROnPlateau -> best-loss
checkpointing -> resume.

TPU-native: one jitted data-parallel train step over a ``data`` mesh
(batch sharded, params replicated; XLA inserts the gradient all-reduce),
threaded host input pipeline with static batch shapes, orbax checkpoints.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from ..parallel import data_parallel_step, make_mesh, replicate, shard_batch
from .checkpoint import load_checkpoint, save_checkpoint
from .optim import TrainState, make_optimizer
from .schedule import ReduceLROnPlateau


class AverageMeter:
    """Running average (reference train.py:79-93)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(1, self.count)


def run_training_with_recovery(max_retries: int = 2, **kwargs):
    """Failure detection / crash recovery around ``run_training`` — the
    reference has none (SURVEY.md §5.3: crashes lose the epoch). On an
    exception mid-training, resume from the last best checkpoint (if a
    save path was given) up to ``max_retries`` times."""
    save_path = kwargs.get("save_path")
    retries = 0
    while True:
        try:
            return run_training(**kwargs)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001
            retries += 1
            if retries > max_retries or not save_path:
                raise
            import os

            if os.path.exists(save_path):
                kwargs["checkpoint"] = save_path
            print(
                f"[recovery] training failed ({type(e).__name__}: "
                f"{str(e)[:120]}); resuming from "
                f"{kwargs.get('checkpoint')} (retry {retries}/{max_retries})",
                flush=True,
            )


def run_training(
    *,
    model,
    criterion,
    make_step: Callable,
    train_batches: Callable[[int], "iter"],
    eval_batches: Callable[[], "iter"],
    init_batch,
    epochs: int,
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
    freeze_patterns=(),
    train_patterns=None,
    seed: int = 0,
    save_path: Optional[str] = None,
    checkpoint: Optional[str] = None,
    lr_patience: int = 10,
    log_every: int = 10,
    data_parallel: bool = True,
    extra_rngs=("noise",),
    make_eval=None,
    visualizer=None,
):
    """Generic loop. ``make_step(model, criterion)`` returns the step fn;
    ``train_batches(epoch)`` yields batches (arrays or tuples);
    ``init_batch`` is one batch for parameter init."""
    rng = jax.random.PRNGKey(seed)
    init_rngs = {"params": rng}
    for name in ("noise", "dropout"):
        init_rngs[name] = jax.random.fold_in(rng, hash(name) % 1000)
    example = init_batch if isinstance(init_batch, tuple) else (init_batch,)
    variables = jax.jit(model.init)(
        init_rngs, *[jax.numpy.asarray(e) for e in example]
    )

    tx = make_optimizer(
        learning_rate, aux_learning_rate, clip_max_norm,
        freeze_patterns, train_patterns,
    )
    state = TrainState.create(variables["params"], tx)
    start_epoch = 0
    sched = ReduceLROnPlateau(learning_rate, patience=lr_patience)
    best_loss = float("inf")

    if checkpoint:
        state, meta = load_checkpoint(checkpoint, target=state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_loss = float(meta.get("best_loss", best_loss))
        print(f"resumed from {checkpoint} at epoch {start_epoch}")

    extra_vars = {k: v for k, v in variables.items() if k != "params"}
    try:
        step_fn = make_step(model, criterion, extra_vars=extra_vars)
    except TypeError:
        step_fn = make_step(model, criterion)
    batch_dim = (
        init_batch[0].shape[0]
        if isinstance(init_batch, tuple)
        else init_batch.shape[0]
    )
    use_dp = bool(
        data_parallel
        and jax.device_count() > 1
        and batch_dim % jax.device_count() == 0
    )
    if use_dp:
        mesh = make_mesh()
        state = replicate(state, mesh)
        step = data_parallel_step(step_fn, mesh)

        def put(b):
            return jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), b)
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))

        def put(b):
            return b

    step_rng = jax.random.fold_in(rng, 12345)
    history = []
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        meter = AverageMeter()
        for i, batch in enumerate(train_batches(epoch)):
            state, metrics = step(state, put(batch), step_rng)
            if i % log_every == 0:
                metrics = jax.device_get(metrics)
                meter.update(metrics["loss"])
                parts = " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
                )
                print(f"epoch {epoch} step {i}: {parts}", flush=True)

        # eval (make_eval=False disables; default = RD eval step)
        eval_meter = AverageMeter()
        if make_eval is not False:
            eval_fn = None
            for batch in eval_batches():
                if eval_fn is None:
                    if make_eval is None:
                        from .steps import make_eval_step

                        eval_fn = jax.jit(
                            make_eval_step(model, criterion, extra_vars)
                        )
                    else:
                        eval_fn = jax.jit(make_eval(model, criterion))
                m = jax.device_get(eval_fn(state.params, jax.numpy.asarray(
                    batch if not isinstance(batch, tuple) else batch[0]
                )))
                eval_meter.update(m["loss"])
        test_loss = eval_meter.avg if eval_meter.count else meter.avg
        new_lr = sched.step(test_loss)
        if new_lr != learning_rate:
            print(f"lr -> {new_lr}")
            learning_rate = new_lr
            tx = make_optimizer(
                new_lr, aux_learning_rate, clip_max_norm,
                freeze_patterns, train_patterns,
            )
            state = state.replace(tx=tx)
            step = (
                data_parallel_step(step_fn, mesh)
                if use_dp
                else jax.jit(step_fn, donate_argnums=(0,))
            )

        history.append(test_loss)
        is_best = test_loss < best_loss
        best_loss = min(test_loss, best_loss)
        print(
            f"epoch {epoch}: test_loss={test_loss:.4f} "
            f"best={best_loss:.4f} ({time.time() - t0:.1f}s)",
            flush=True,
        )
        if visualizer is not None:  # file-based curves (utils/visualizer)
            visualizer.vis_scalar("train_loss", epoch, meter.avg)
            visualizer.vis_scalar("test_loss", epoch, test_loss)
            visualizer.vis_scalar("lr", epoch, learning_rate)
            visualizer.vis_scalar("epoch_seconds", epoch, time.time() - t0)
        if save_path and is_best:
            save_checkpoint(
                save_path, state,
                {"epoch": epoch, "best_loss": best_loss},
            )
    return state, history
