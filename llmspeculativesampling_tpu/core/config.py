"""Model configuration dataclasses (frozen & hashable -> jit static args).

Covers the two decoder families the reference patches
(/root/reference/sampling/models/modeling_llama.py, modeling_opt.py) plus
the knobs the TPU build adds (dtype, quantization).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder-only Llama family (llama-68m/160m/2-7b/2-13b...).

    Mirrors the HF hyperparameters consumed by the reference's forked
    modeling_llama.py:75-934 (RoPE, GQA, RMSNorm, SiLU-gated MLP).
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    max_position: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # RoPE position scaling: None (plain) or a ("linear"|"dynamic", factor)
    # tuple — the two rotary variants the reference supports
    # (modeling_llama.py:128-160, selected from config at :263-283).
    # A tuple (not the HF dict) keeps the config hashable for jit.
    rope_scaling: Optional[tuple] = None
    tie_embeddings: bool = False
    dtype: str = "bfloat16"
    # flash-decode attention kernel: "auto" (TPU + worthwhile shapes),
    # "on" (force), "off" (always XLA; e.g. under vmap-of-forward)
    flash: str = "auto"
    # Qwen2 variant: q/k/v projections carry a bias (HF Qwen2Attention
    # hardcodes bias=True for qkv, False for o). Mistral maps onto the
    # base layout (qkv_bias=False) directly.
    qkv_bias: bool = False
    # Sliding-window marker (Mistral; Qwen2 with use_sliding_window):
    # this decoder implements full attention only, which equals windowed
    # attention while the context stays within the window. The loader
    # clamps max_position to the window AND records it here so
    # ModelBundle.make_cache can REJECT caches larger than the window —
    # serving past it would silently produce full-attention logits that
    # diverge from HF (ADVICE r2 finding #1).
    sliding_window: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def jnp_dtype(self):
        return _DTYPES[self.dtype]


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    """Decoder-only OPT family (opt-125m...opt-13b).

    Mirrors the HF hyperparameters consumed by the reference's forked
    modeling_opt.py:98-1286 (learned positional embeddings with offset 2,
    pre-LN, ReLU MLP, optional embed projections for 350m).
    """

    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position: int = 2048
    word_embed_proj_dim: Optional[int] = None  # != hidden_size only for 350m
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    flash: str = "auto"  # see LlamaConfig.flash

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @property
    def jnp_dtype(self):
        return _DTYPES[self.dtype]
