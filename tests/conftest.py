"""Test harness setup: force CPU with 8 virtual devices so multi-chip
sharding paths can be exercised without TPU hardware (the analogue of the
reference's `mpirun -n 4` single-machine MPI testing, wscript:543-551).

Note: this environment registers an 'axon' TPU platform via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone cannot force CPU —
jax.config.update after import can (backends initialize lazily)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: recompiles across test runs are the dominant
# cost on small hosts.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

if os.environ.get("MLSGPU_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
