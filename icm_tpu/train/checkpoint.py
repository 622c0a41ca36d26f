"""Checkpoint save/load via orbax.

Parity with the reference checkpointing (reference ``train.py:515-527``:
dict of {epoch, state_dict, loss, optimizer, aux_optimizer, lr_scheduler},
best-loss tracking; resume at ``train.py:460-487``). Here the whole
TrainState pytree (params + optimizer state + step) plus scalar metadata
round-trips through an orbax PyTreeCheckpointer.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, metadata: Optional[dict] = None):
    """Save a pytree (e.g. TrainState) + metadata dict to ``path``.

    The state is converted to a name-based flax state dict first so
    optimizer namedtuple structures round-trip independent of orbax's
    tree representation."""
    import flax.serialization

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
        "metadata": dict(metadata or {}),
    }
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str, target=None) -> Any:
    """Load; if ``target`` given, maps the raw restore onto its structure
    by name via flax.serialization (CDF-buffer-style dynamic shapes are
    not an issue here — tables are rebuilt from params by
    ``build_codec_tables``, cf. the reference's
    ``update_registered_buffers`` dance, models/utils.py:46-111)."""
    import flax.serialization

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    state = restored["state"]
    if target is not None:
        state = flax.serialization.from_state_dict(target, state)
    return state, restored.get("metadata", {})
