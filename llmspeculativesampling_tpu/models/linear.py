"""Linear-layer dispatch: dense bf16 matmul or Pallas int8 dequant-matmul.

Model code calls ``linear(x, w)`` and works unchanged whether ``w`` is a
raw ``[K, N]`` array or a quantized ``{"q": int8, "s": f32}`` dict
(``quant.core``). The dispatch happens at trace time (pytree structure is
static), so each variant compiles to its own XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.int8_matmul import int8_matmul
from ..quant.core import QUANT_LEAF_Q, QUANT_LEAF_S, is_quantized_leaf


def linear(x: jax.Array, w, bias: Optional[jax.Array] = None) -> jax.Array:
    if is_quantized_leaf(w):
        y = int8_matmul(x, w[QUANT_LEAF_Q], w[QUANT_LEAF_S])
    else:
        y = x @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def lm_head_logits(h: jax.Array, head) -> jax.Array:
    """Project hidden states to fp32 logits. ``head`` is either the dense
    ``[V, H]`` (tied/untied embedding layout) or the quantized
    ``{"q": [H, V], "s": [V]}`` re-layout from ``quantize_params``."""
    if is_quantized_leaf(head):
        return int8_matmul(h, head[QUANT_LEAF_Q], head[QUANT_LEAF_S]).astype(
            jnp.float32
        )
    return jnp.einsum("bsh,vh->bsv", h, head, preferred_element_type=jnp.float32)
