"""Test harness config: force an 8-device virtual CPU mesh before jax import.

This is the "fake backend" the reference lacks (SURVEY.md §4): all sharding /
multi-chip tests run against 8 virtual CPU devices so CI needs no TPU.
"""

import os

# Hard-set: the environment exports JAX_PLATFORMS=axon (the TPU tunnel) and
# the plugin re-asserts it, so setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
jax.config.update("jax_enable_x64", False)
# CPU XLA's default matmul precision is bf16-like (~1e-3 error) which breaks
# golden-logit parity tests; force full fp32 accumulation under test.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles several hundred XLA:CPU programs in one
    process; past ~70 accumulated programs the CPU backend segfaults
    inside backend_compile (deterministic at the same test, passes in
    isolation or with any half of the suite). Releasing executables at
    module boundaries keeps the live-program count bounded."""
    yield
    jax.clear_caches()
