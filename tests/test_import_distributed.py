"""Package import must not initialize XLA when multi-host env vars are set.

Regression test for ADVICE r3 finding #1: with ``JAX_PLATFORMS`` unset (the
normal real-TPU-VM case) the compile-cache auto-detect used to call
``jax.default_backend()`` at import, initializing XLA backends before
``jax.distributed.initialize`` could run — which then raises
``RuntimeError('... must be called before any JAX computations ...')`` and
breaks every real multi-host entry point (incl. ``PagedMultiHostDriver``).

The fix defers cache auto-detection when ``JAX_COORDINATOR_ADDRESS`` /
``JAX_NUM_PROCESSES`` are present; ``initialize_cluster`` re-engages it
after the cluster is up. These tests run the import in a subprocess (the
in-process backend is already initialized by conftest).
"""

import os
import subprocess
import sys

_CHECK = r"""
import os, sys
import llmspeculativesampling_tpu  # the import under test
from jax._src import xla_bridge
# jax.distributed.initialize() uses exactly this predicate to decide
# whether it is too late to join a cluster.
sys.exit(1 if xla_bridge.backends_are_initialized() else 0)
"""


def _run_import_probe(extra_env):
    env = {k: v for k, v in os.environ.items()}
    # Simulate the real-TPU-VM case: platform auto-detection.
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("LLMSS_NO_COMPILE_CACHE", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", _CHECK],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_import_with_coordinator_env_leaves_backends_uninitialized():
    res = _run_import_probe({"JAX_COORDINATOR_ADDRESS": "localhost:65432"})
    assert res.returncode == 0, (
        "import initialized XLA backends despite JAX_COORDINATOR_ADDRESS "
        f"being set\nstdout: {res.stdout}\nstderr: {res.stderr}"
    )


def test_import_with_num_processes_env_leaves_backends_uninitialized():
    res = _run_import_probe({"JAX_NUM_PROCESSES": "2"})
    assert res.returncode == 0, (
        "import initialized XLA backends despite JAX_NUM_PROCESSES=2\n"
        f"stdout: {res.stdout}\nstderr: {res.stderr}"
    )


def test_import_with_explicit_platform_still_safe_in_distributed_env():
    # With JAX_PLATFORMS set the cache gate never resolves a backend, so
    # it may run at import even under distributed env vars.
    env = {k: v for k, v in os.environ.items()}
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COORDINATOR_ADDRESS"] = "localhost:65432"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    res = subprocess.run(
        [sys.executable, "-c", _CHECK],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, (
        f"explicit-platform import initialized backends\nstderr: {res.stderr}"
    )
