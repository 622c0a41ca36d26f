"""Test config: force pure-CPU JAX with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4.4).

Speed note: the axon sitecustomize registers the remote-TPU PJRT plugin at
*interpreter start* whenever PALLAS_AXON_POOL_IPS is set, dialing the TPU
tunnel (minutes of latency on a cold link). Prefer launching tests via
``tools/test.sh`` (or ``env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
python -m pytest ...``) so that registration never happens. This conftest
additionally forces the CPU platform post-import so a plain
``python -m pytest tests/`` still runs everything on the virtual CPU mesh.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize may have imported jax already (capturing JAX_PLATFORMS=axon
# from the environment); override the live config before any backend
# initializes.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's wall time is dominated by XLA
# compiles of tiny graphs; caching them across runs cuts repeat runs by
# an order of magnitude (cache is keyed by HLO hash — always safe)
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_icm_tpu_tests"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
