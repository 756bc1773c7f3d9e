"""Test bootstrap: force an 8-device virtual CPU platform.

Multi-device sharding logic (DP training, sharded top-k merge) is exercised on
a virtual CPU mesh so tests never require TPU hardware — the substitute for the
reference's missing distributed tests (SURVEY.md section 4).

The ambient environment may point JAX at a TPU (JAX_PLATFORMS=axon) whose
default fp32 matmul precision is too loose for exact-math tests, and pytest
plugins (jaxtyping) import jax before this conftest runs — so we override both
the env vars and the live jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (~12 min cold);
# repeat runs reuse compiled programs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
