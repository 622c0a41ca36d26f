"""Learning-rate scheduling.

Parity with the reference's ``ReduceLROnPlateau`` usage
(reference ``train.py:444, 506``: mode 'min' on the test loss).
Host-side state feeding an ``optax.inject_hyperparams`` learning rate.
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(
        self,
        lr: float,
        factor: float = 0.1,
        patience: int = 10,
        min_lr: float = 0.0,
    ):
        self.lr = float(lr)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        """Update with the latest validation metric; returns current lr."""
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.bad_epochs = 0
        return self.lr


class PolyLR:
    """Polynomial LR decay (reference deeplab/high_utils/scheduler.py:3-13:
    lr = base * (1 - step/max_steps)^power)."""

    def __init__(self, base_lr: float, max_steps: int, power: float = 0.9,
                 min_lr: float = 0.0):
        self.base_lr = base_lr
        self.max_steps = max_steps
        self.power = power
        self.min_lr = min_lr

    def __call__(self, step: int) -> float:
        frac = min(step, self.max_steps) / self.max_steps
        return max(self.min_lr, self.base_lr * (1 - frac) ** self.power)
