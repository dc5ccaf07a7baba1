"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).

Note: this environment force-registers a remote TPU PJRT plugin ("axon")
in every interpreter and pins ``JAX_PLATFORMS=axon``; the env var cannot be
overridden from outside, so we must switch the backend via
``jax.config.update`` before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compilation cache: this VM has 4 slow vCPUs, re-running the
# suite should not recompile everything
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
