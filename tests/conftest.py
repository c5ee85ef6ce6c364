"""Test configuration: run the suite on CPU with x64 and 8 virtual devices.

The solver itself is dtype-parametric (f32 on real TPU hardware); derivative
validation against finite differences — the reference's core quality gate
(`/root/reference/src/integrators/_integrators.jl:97-242`) — needs f64, and
multi-chip sharding tests emulate an 8-device mesh on CPU as the driver does.
"""

import os

# NOTE: this environment's sitecustomize imports jax at interpreter startup,
# so JAX_PLATFORMS in os.environ is read too late — use jax.config instead
# (effective as long as no backend has been initialized yet). XLA_FLAGS is
# read at backend-init time, so setting it here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the dominant suite cost is XLA-compiling the
# IPM while_loop graph per (structure, dtype) — identical across runs and
# across xdist workers. With the cache warm the suite is minutes faster; run
# `python -m pytest tests/ -n 4` to split cold compiles over cores.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
