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
