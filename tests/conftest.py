"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding-correctness of the distributed BA/pose-graph path is validated on
`--xla_force_host_platform_device_count=8` exactly as SURVEY.md §4 prescribes
(the reference has no tests at all; we test every kernel against oracles and
every solver against closed forms / scipy).
"""

import os

# Hard override: the container pre-sets JAX_PLATFORMS=axon (tunneled TPU with
# ~20-40 s compiles); unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize pre-imports jax (axon plugin registration) before conftest
# runs, so the env var above can be too late; the config knob still wins as
# long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "tests expect the virtual 8-device CPU mesh"

# f32 matmul accuracy for oracle comparisons (default lowers precision).
jax.config.update("jax_default_matmul_precision", "highest")
# This box has 2 cores; persistent compilation cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
