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
# (auto-detected platform — e.g. a real TPU VM) the backend is resolved
# once here so the cache still engages (ADVICE r2 finding #2); that
# initializes the backend at import, which any real use pays immediately
# anyway.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if (
    not _os.environ.get("LLMSS_NO_COMPILE_CACHE")
    and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
):
    try:
        import jax as _jax

        _on_tpu = "tpu" in _plat or "axon" in _plat
        if not _plat:  # auto-detect: ask the resolved backend
            _on_tpu = _jax.default_backend() not in ("cpu", "gpu")
        if _on_tpu:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.expanduser("~"), ".cache", "llmss_tpu_xla"),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

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
