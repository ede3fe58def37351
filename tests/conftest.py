"""Test harness: always run on CPU-JAX with 8 virtual devices.

Mirrors the reference's hardware-free CI gate (mock backend + ORT-CPU —
docs/ci_runner.md:7-30): CPU-jax is our always-available backend for the full
parity ladder; multi-chip sharding is validated on a virtual 8-device mesh.
"""

import os

# Force CPU even if the environment pre-sets a TPU platform (e.g. axon); opt
# into real-device tests with TRT_ASR_TEST_PLATFORM=tpu. The axon
# sitecustomize overrides JAX_PLATFORMS at interpreter startup, so the env
# var alone is not enough — we must also update jax.config after import.
_platform = os.environ.get("TRT_ASR_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """XLA-CPU segfaults non-deterministically when a long-lived process
    keeps compiling (docs/DEBUGGING.md trap #6); in r5 the full suite
    died three times in a row at ~72% inside whatever test compiled next
    (each time a different one), while the same files pass together in a
    fresh process. Dropping the accumulated compiled executables at
    module boundaries keeps the per-compile process state small;
    recompilation is transparent (tiny-config programs, CPU-cheap)."""
    yield
    jax.clear_caches()
