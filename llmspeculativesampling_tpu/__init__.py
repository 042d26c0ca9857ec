"""TPU-native speculative-decoding inference engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference research codebase (see SURVEY.md): 9 decoding algorithms, a
static-shape rollback-capable KV-cache runtime, patched-attention Llama/OPT
model cores, an evaluation harness, and a serving endpoint — rebuilt around
fused jitted decode steps, fixed shapes, explicit PRNG keys, and
mesh-sharded execution.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compiles of the big fused decode
# programs cost 20-60 s each on the remote chip; caching them makes every
# later process start warm (verified working on the axon TPU backend).
# Opt out with LLMSS_NO_COMPILE_CACHE=1 or by setting
# JAX_COMPILATION_CACHE_DIR yourself.
#
# Gated to the TPU backends: cache-write during CPU backend_compile
# segfaults (observed on the virtual-device test mesh), and the CPU
# compiles it would save are cheap anyway. When JAX_PLATFORMS is unset
# (auto-detected platform — e.g. a real TPU VM) the backend would have to
# be resolved to know whether we're on TPU — but resolving it at import
# initializes XLA, which breaks ``jax.distributed.initialize`` (it must
# run before any JAX computation; ADVICE r3 finding #1). So: when
# multi-host env vars are present the auto-detect branch is DEFERRED and
# ``parallel.distributed.initialize_cluster`` re-invokes it after the
# cluster is up; single-host auto-detect still engages at import.


def _configure_compile_cache() -> None:
    """Enable the persistent XLA cache when running on a TPU backend.

    Safe to call more than once; resolves the backend (initializing XLA),
    so multi-host entry points must call it only *after*
    ``jax.distributed.initialize``.
    """
    if _os.environ.get("LLMSS_NO_COMPILE_CACHE") or _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        return
    try:
        import jax as _jax

        plat = _os.environ.get("JAX_PLATFORMS", "")
        on_tpu = "tpu" in plat or "axon" in plat
        if not plat:  # auto-detect: ask the resolved backend
            on_tpu = _jax.default_backend() not in ("cpu", "gpu")
        if on_tpu:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.expanduser("~"), ".cache", "llmss_tpu_xla"),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_distributed_env = bool(
    _os.environ.get("JAX_COORDINATOR_ADDRESS")
    or _os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1")
)
if _os.environ.get("JAX_PLATFORMS", "") or not _distributed_env:
    _configure_compile_cache()

from .engine import (  # noqa: E402
    ModelBundle,
    autoregressive_generate,
    beam_speculative_generate,
    beam_speculative_v2_generate,
    bild_generate,
    mjsd_generate,
    multi_beam_generate,
    multi_speculative_generate,
    random_width_beam_generate,
    speculative_generate,
    speculative_generate_v2,
)

# Reference-style aliases mirroring sampling/__init__.py:1-7 of the
# upstream codebase so users can map names 1:1.
speculative_sampling = speculative_generate
speculative_sampling_v2 = speculative_generate_v2
autoregressive_sampling = autoregressive_generate
multi_speculative_sampling = multi_speculative_generate
mjsd_speculative_sampling = mjsd_generate
beam_speculative_sampling = beam_speculative_generate
beam_speculative_sampling_v2 = beam_speculative_v2_generate
BiLD_sampling = bild_generate
random_width_beam_sampling = random_width_beam_generate

__all__ = [
    "ModelBundle",
    "autoregressive_generate",
    "beam_speculative_generate",
    "beam_speculative_v2_generate",
    "bild_generate",
    "mjsd_generate",
    "multi_beam_generate",
    "multi_speculative_generate",
    "random_width_beam_generate",
    "speculative_generate",
    "speculative_generate_v2",
    "speculative_sampling",
    "speculative_sampling_v2",
    "autoregressive_sampling",
    "multi_speculative_sampling",
    "mjsd_speculative_sampling",
    "beam_speculative_sampling",
    "beam_speculative_sampling_v2",
    "BiLD_sampling",
    "random_width_beam_sampling",
]
