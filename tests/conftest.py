"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates the real
multi-chip path separately via `__graft_entry__.dryrun_multichip`).

Note: the environment pre-imports jax and sets JAX_PLATFORMS (e.g. to a TPU
tunnel), so plain env-var defaults do NOT work here — we must override the
config explicitly before the backend initializes. We also pin matmul
precision to "highest": TPU f32 matmuls otherwise run in bf16 passes, which
breaks exact-math tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite jit-compiles hundreds of programs;
# caching them across runs cuts repeat wall-clock substantially.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
