"""Dual-optimizer setup.

Parity with the reference ``configure_optimizers`` (reference:
``train.py:105-169``): a main Adam over all parameters except the
entropy-bottleneck quantiles, and an aux Adam over only the quantiles.

JAX note: in the training forward pass the main (RD) loss has *zero*
gradient w.r.t. the quantiles (the STE z_offset contribution cancels and
noise-mode quantization ignores medians), and the aux loss stops gradients
through the density parameters — so a single backward pass of
``rd_loss + aux_loss`` yields exactly the reference's two gradient sets,
routed to the two optimizers with ``optax.multi_transform``.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


def _path_names(path):
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def _label_params(params, freeze_patterns=(), train_patterns=None) -> Any:
    """'aux' for quantile leaves, 'frozen' for frozen subtrees, 'main'
    otherwise. ``train_patterns`` (if given) freezes everything whose path
    does NOT contain one of the substrings — the reference's selective
    training (e.g. TrainList=['promot','student'],
    train_segmentation.py:121; 'seg' in train_seg_oj.py:149).
    ``freeze_patterns`` always freezes matches (e.g. 'task_net')."""

    def label(path, _):
        names = _path_names(path)
        joined = "/".join(names)
        if any(pat in joined for pat in freeze_patterns):
            return "frozen"
        if train_patterns is not None and not any(
            pat in joined for pat in train_patterns
        ):
            return "frozen"
        return "aux" if any(n == "quantiles" for n in names) else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
    freeze_patterns=(),
    train_patterns=None,
) -> optax.GradientTransformation:
    main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm else optax.identity(),
        optax.adam(learning_rate),
    )
    aux = optax.adam(aux_learning_rate)

    def labeler(params):
        return _label_params(params, tuple(freeze_patterns), train_patterns)

    return optax.multi_transform(
        {"main": main, "aux": aux, "frozen": optax.set_to_zero()}, labeler
    )


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )
