"""Test harness config: force CPU backend with a virtual 8-device mesh.

Multi-chip sharding (parallel/) is validated on ``--xla_force_host_platform_device_count=8``
virtual CPU devices, per the TPU-less CI strategy; real-chip perf is bench.py's job.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon sitecustomize force-registers the tunneled TPU backend (priority
# over JAX_PLATFORMS) whenever PALLAS_AXON_POOL_IPS is set — clear it so tests
# really run on CPU with virtual devices
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: pallas/XLA compiles dominate test wall-clock; cache
# them across pytest runs (cache dir is gitignored).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon sitecustomize already ran at interpreter start and force-set
# jax_platforms="axon,cpu"; override it before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
