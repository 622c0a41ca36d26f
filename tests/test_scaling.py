"""Multi-device scaling evidence beyond the dryrun (SURVEY.md §5.8).

On the virtual CPU mesh wall-clock cannot demonstrate ICI scaling (all
"devices" share this host's cores), so the honest measurables are:

1. **Per-device partitioned cost**: XLA SPMD compiles one per-device
   module; its ``cost_analysis()`` FLOPs must shrink as 1/N for a fixed
   global batch. That is the compiler-accounted scaling curve — per-device
   throughput invariance follows on real chips, where each device runs its
   module concurrently.
2. **Semantic invariance**: the SAME global batch trained over a 2-device
   and an 8-device mesh must produce the same loss (the partitioning is a
   layout choice, not a numerical one), and the sharded codec must emit
   byte-identical streams regardless of mesh size.

``tools/scaling_probe.py`` prints the same quantities as a table for
BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.parallel import data_parallel_step, replicate, shard_batch
from icm_tpu.train import (
    RateDistortionLoss,
    TrainState,
    make_optimizer,
    make_train_step,
)
from icm_tpu.utils.roofline import compiled_costs

pytestmark = pytest.mark.slow

TINY = dict(
    N=16,
    M=24,
    num_slices=6,
    max_support_slices=5,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(12, 14, 16, 20, 24),
    cc_widths=(16, 12, 10, 8),
)

GLOBAL_BATCH = 8


def _mesh(n):
    assert len(jax.devices()) >= n, "conftest forces 8 virtual CPU devices"
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _setup():
    model = WACNN(**TINY)
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (GLOBAL_BATCH, 64, 64, 3), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x[:1],
    )
    # host copy: the train step donates its state, and device_put may alias
    # rather than copy a device-resident source — fresh params per mesh
    variables = jax.device_get(variables)
    return model, variables, np.asarray(x)


def _compiled_step(model, variables, x, n_devices):
    mesh = _mesh(n_devices)
    step = data_parallel_step(
        make_train_step(model, RateDistortionLoss(0.01)), mesh
    )
    state = TrainState.create(
        replicate(variables["params"], mesh), make_optimizer()
    )
    state = state.replace(step=replicate(state.step, mesh))
    batch = shard_batch(x, mesh)
    rng = replicate(jax.random.PRNGKey(42), mesh)
    compiled = step.lower(state, batch, rng).compile()
    return compiled, (state, batch, rng)


def test_train_step_per_device_cost_scales():
    model, variables, x = _setup()
    costs, losses = {}, {}
    for n in (2, 8):
        compiled, args = _compiled_step(model, variables, x, n)
        c = compiled_costs(compiled)
        assert c is not None and c["flops"] > 0
        costs[n] = c["flops"]
        _, metrics = compiled(*args)
        losses[n] = float(metrics["loss"])

    # fixed global batch: per-device FLOPs must scale ~1/N (the gradient
    # all-reduce adds O(params) work, hence the loose band)
    ratio = costs[2] / costs[8]
    assert 2.5 < ratio < 4.5, (costs, ratio)

    # same global batch, same params -> same loss whatever the mesh size
    assert np.isclose(losses[2], losses[8], rtol=1e-4), losses


def test_forward_per_device_cost_scales():
    model, variables, x = _setup()
    costs = {}
    for n in (2, 8):
        mesh = _mesh(n)
        fwd = jax.jit(
            lambda v, xx: model.apply(v, xx, training=False)["x_hat"],
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P("data")),
            ),
        )
        compiled = fwd.lower(
            replicate(variables, mesh), shard_batch(x, mesh)
        ).compile()
        c = compiled_costs(compiled)
        assert c is not None and c["flops"] > 0
        costs[n] = c["flops"]
    ratio = costs[2] / costs[8]
    assert 3.0 < ratio < 4.5, (costs, ratio)


def test_sharded_codec_streams_mesh_invariant():
    """The bitstream must not depend on how the batch was partitioned:
    encode over a 2-device and an 8-device mesh -> byte-identical
    per-image streams (serving can re-shard freely across pool sizes)."""
    model, variables, x = _setup()
    streams = {}
    for n in (2, 8):
        mesh = _mesh(n)
        sharding = NamedSharding(mesh, P("data"))
        codec = CharmCodec(model, variables, data_sharding=sharding)
        enc = codec.compress(jax.device_put(x, sharding))
        streams[n] = enc["strings"]
    y2, z2 = streams[2]
    y8, z8 = streams[8]
    assert [bytes(s) for s in y2] == [bytes(s) for s in y8]
    assert [bytes(s) for s in z2] == [bytes(s) for s in z8]


def test_sharded_scan_wire_mesh_invariant_and_bitexact():
    """Same invariant for the SERVING path (VERDICT r4 #5): the scan
    wire — one lax.scan over context + on-device lane rANS — run with
    the batch sharded over 2- and 8-device meshes must (a) round-trip
    y_hat bitexactly against the encoder's reconstruction on each mesh
    and (b) emit byte-identical per-image streams across mesh sizes
    (no cross-batch reduction exists in the codec, so partitioning is a
    layout choice, not a numerical one)."""
    from icm_tpu.models.device_codec import DeviceWireCodec

    model, variables, x = _setup()
    streams = {}
    tables = None
    for n in (2, 8):
        mesh = _mesh(n)
        sharding = NamedSharding(mesh, P("data"))
        codec = DeviceWireCodec(
            model, variables, lanes_per_image=4, scan_wire=True,
            data_sharding=sharding, tables=tables,
        )
        tables = codec.tables  # build CDFs once
        enc = codec.compress(jax.device_put(x, sharding), return_debug=True)
        dec = codec.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
        )
        streams[n] = enc["strings"]
    y2, z2 = streams[2]
    y8, z8 = streams[8]
    assert [bytes(s) for s in y2] == [bytes(s) for s in y8]
    assert [bytes(s) for s in z2] == [bytes(s) for s in z8]
