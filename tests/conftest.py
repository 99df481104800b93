"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (SURVEY.md §4 'fake backend' analog).

NOTE: this container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so setting the env var here is too late —
we must update the already-imported jax config instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
