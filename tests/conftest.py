"""Test configuration.

Runs the suite on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the "fake backend" pattern — the reference
runs its KernelAbstractions GPU kernels on the CPU() backend the same way,
see /root/reference/test/gpu_performance.jl:27-37).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's .axon_site hook pins JAX_PLATFORMS=axon (TPU tunnel);
# override at the config level so the unit suite runs on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the P3/kernel integration tests compile very
# large XLA programs; caching the executables on disk makes repeat suite runs
# minutes faster (first run in a fresh checkout pays full compile cost once).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(params=["float32", "float64"])
def dtype(request):
    import numpy as np

    return np.dtype(request.param)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A multi-hundred-program pytest session has segfaulted XLA:CPU inside
    ``backend_compile`` when compiling the large fused P3 programs late in
    the run (LLVM JIT code-memory exhaustion); the same programs compile
    fine in a fresh process. Bounding the in-memory executable cache keeps
    the long suite stable.
    """
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-compiling benchmark/integration tests")
