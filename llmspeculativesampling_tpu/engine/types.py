"""Engine-level shared types and helpers."""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..cache.kvcache import KVCache, init_cache, init_quant_cache


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Static half of a model: config + pure forward fn.

    ``forward(params, cfg, tokens, cache, positions=None, tree_mask=None)``
    -> (logits_f32 [B,S,V], cache). The params pytree travels separately so
    the bundle stays hashable as a jit static argument. ``kv_quant=True``
    switches the cache to the int8 variant (M5)."""

    family: str
    cfg: object
    forward: Callable
    kv_quant: bool = False

    def make_cache(self, batch: int, max_len: int):
        c = self.cfg
        window = getattr(c, "sliding_window", None)
        if window is not None and max_len > window:
            # full attention == windowed attention only within the
            # window; beyond it logits silently diverge from HF
            # (core/config.py sliding_window note)
            raise ValueError(
                f"cache max_len {max_len} exceeds the model's sliding "
                f"window {window}: this decoder implements full attention "
                "and matches the checkpoint only within the window"
            )
        if self.kv_quant:
            return init_quant_cache(c.num_layers, batch, c.num_kv_heads, max_len, c.head_dim)
        return init_cache(
            c.num_layers, batch, c.num_kv_heads, max_len, c.head_dim, c.jnp_dtype
        )


def aligned_total(n: int, multiple: int = 128) -> int:
    """Round a cache allocation up to an XLA-tile / flash-chunk multiple.

    Keeps decode-attention shapes tile-aligned and lets the length-aware
    flash kernel (kernels/flash_decode.py) engage (it needs S_max % 128
    == 0); a few extra dead slots cost nothing since attention over them
    is masked (XLA path) or never fetched (flash path)."""
    return -(-n // multiple) * multiple


def pad_prompt(prompt, bucket_multiple: int = 64):
    """Host-side: right-pad a [P] (or [1,P]) id list to a static bucket.

    Returns (padded [1, bucket] int32 numpy, true_len int).
    """
    ids = np.asarray(prompt, dtype=np.int32).reshape(-1)
    p = ids.shape[0]
    bucket = max(bucket_multiple, -(-p // bucket_multiple) * bucket_multiple)
    out = np.zeros((1, bucket), np.int32)
    out[0, :p] = ids
    return out, p


def first_eos_truncate(tokens: np.ndarray, prompt_len: int, total_len: int, eos_token_id: int) -> np.ndarray:
    """Truncate generated tokens at the first EOS *after* the prompt,
    keeping the EOS (reference speculative_sampling.py:2033-2041 semantics:
    only EOS beyond the prompt's original count terminates)."""
    seq = np.asarray(tokens).reshape(-1)[:total_len]
    gen = seq[prompt_len:]
    hits = np.nonzero(gen == eos_token_id)[0]
    if hits.size:
        return seq[: prompt_len + hits[0] + 1]
    return seq
