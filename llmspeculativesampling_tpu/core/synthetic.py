"""Synthetic draft/target model pairs for offline benchmarking.

The environment has zero egress, so real checkpoints (JackFram/llama-68m,
Llama-2-13b — reference README.md:9) may be absent. This builds a random
target and a draft sharing its first layers, with deeper target layers
damped so the draft genuinely approximates the target (acceptance ~0.9,
like a trained small/large pair). Compute and memory profiles are real.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.types import ModelBundle
from .config import LlamaConfig, OPTConfig


def synthetic_pair(
    family: str = "llama",
    *,
    hidden_size: int = 2048,
    num_layers: int = 16,
    draft_layers: int = 2,
    num_heads: int = 16,
    vocab_size: int = 32000,
    max_position: int = 2048,
    dtype: str = "bfloat16",
    damp: float = 0.02,
    seed: int = 1,
):
    """Return (bundle_d, params_d, bundle_t, params_t)."""
    if family == "llama":
        from ..models import llama as mod

        cfg_t = LlamaConfig(
            vocab_size=vocab_size, hidden_size=hidden_size,
            intermediate_size=4 * hidden_size, num_layers=num_layers,
            num_heads=num_heads, num_kv_heads=num_heads,
            max_position=max_position, dtype=dtype,
        )
        out_keys = ("wo", "w_down")
    elif family == "opt":
        from ..models import opt as mod

        cfg_t = OPTConfig(
            vocab_size=vocab_size, hidden_size=hidden_size,
            ffn_dim=4 * hidden_size, num_layers=num_layers,
            num_heads=num_heads, max_position=max_position, dtype=dtype,
        )
        out_keys = ("wo", "fc2_w")
    else:
        raise ValueError(f"unknown family {family!r}")

    bt = ModelBundle(family, cfg_t, mod.forward)
    pt = mod.init_params(cfg_t, jax.random.key(seed))
    scale = jnp.concatenate(
        [jnp.ones(draft_layers), jnp.full((num_layers - draft_layers,), damp)]
    ).astype(cfg_t.jnp_dtype)
    for k in out_keys:
        pt["layers"][k] = pt["layers"][k] * scale[:, None, None]

    cfg_d = type(cfg_t)(**{**cfg_t.__dict__, "num_layers": draft_layers})
    bd = ModelBundle(family, cfg_d, mod.forward)
    pd = {
        **{k: v for k, v in pt.items() if k != "layers"},
        "layers": jax.tree.map(lambda x: x[:draft_layers], pt["layers"]),
    }
    return bd, pd, bt, pt
