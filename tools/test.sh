#!/bin/sh
# Fast test launcher: skip the axon remote-TPU plugin registration (which
# dials the TPU tunnel at interpreter start) and run on a virtual 8-device
# CPU mesh.
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$@"
