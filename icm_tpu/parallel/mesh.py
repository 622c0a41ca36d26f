"""Device-mesh data parallelism.

The reference has no working distributed backend (SURVEY.md §5.8: a
``CustomDataParallel`` exists but is disabled; single-process single-GPU).
The TPU-native equivalent is first-class here: a 1-D ``data`` mesh over
ICI, batch sharded on it, parameters replicated; XLA inserts the gradient
all-reduce. The models are small enough that DP is the honest scaling
story — a ``fsdp`` axis can shard optimizer state for free via sharding
annotations if ever needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host array batch-sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Jit a train step with batch sharded on the data axis and state
    replicated. XLA derives the psum over ICI from the shardings."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def fsdp_sharding(params, mesh: Mesh, axis_name: str = "data", min_size: int = 2 ** 16):
    """FSDP-style parameter sharding: large leaves are sharded over the
    data axis along their largest divisible dimension; small leaves stay
    replicated. XLA inserts the all-gathers at use sites (the SURVEY §5.8
    'free via pjit' option for memory-bound training)."""
    n = mesh.devices.size

    def spec_for(leaf):
        if leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        best = max(range(len(dims)), key=lambda i: dims[i])
        if dims[best] % n != 0:
            return NamedSharding(mesh, P())
        spec = [None] * len(dims)
        spec[best] = axis_name
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, axis_name: str = "data"):
    shardings = fsdp_sharding(params, mesh, axis_name)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
