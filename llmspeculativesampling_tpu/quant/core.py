"""Symmetric per-channel int8 weight quantization.

A quantized weight is a plain dict pytree ``{"q": int8 [..., K, N],
"s": float32 [..., N]}`` — per *output channel* scales, so the matmul can
defer dequantization to one row-scale after the MXU ((x @ q) * s, see
``kernels/int8_matmul.py``). Stacked layer weights ``[L, K, N]`` quantize
per ``(L, N)``. Norm weights / biases / embeddings stay in the model dtype
(embedding rows feed ``take``, not the MXU).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

QUANT_LEAF_Q = "q"
QUANT_LEAF_S = "s"

# 2D-or-stacked matmul weights eligible for quantization, per family.
LLAMA_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
OPT_QUANT_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")


def is_quantized_leaf(w) -> bool:
    return isinstance(w, dict) and QUANT_LEAF_Q in w and QUANT_LEAF_S in w


def quantize_tensor(w: jax.Array) -> dict:
    """Quantize ``[..., K, N]`` over K (reduction axis) -> per-N scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., N]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {QUANT_LEAF_Q: q, QUANT_LEAF_S: scale}


def dequantize_tensor(wq: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (
        wq[QUANT_LEAF_Q].astype(jnp.float32) * wq[QUANT_LEAF_S][..., None, :]
    ).astype(dtype)


def quantize_params(
    params: dict,
    family: str = "llama",
    quantize_lm_head: bool = False,
    extra_keys: Iterable[str] = (),
) -> dict:
    """Quantize the matmul weights of a llama/opt param tree in place-shape.

    ``lm_head`` is stored ``[V, H]`` and consumed as ``h @ head.T``; when
    quantized it is re-laid-out to ``{"q": [H, V], "s": [V]}`` so the same
    kernel serves it (the model dispatches on the dict form).
    """
    keys = set(
        (LLAMA_QUANT_KEYS if family == "llama" else OPT_QUANT_KEYS) + tuple(extra_keys)
    )
    out = dict(params)
    out["layers"] = {
        k: (quantize_tensor(v) if k in keys else v) for k, v in params["layers"].items()
    }
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_tensor(jnp.swapaxes(params["lm_head"], -1, -2))
    return out


def quantized_bytes(params: dict) -> int:
    """HBM footprint of a param tree (for bench reporting)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
