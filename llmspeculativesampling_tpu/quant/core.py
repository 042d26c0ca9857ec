"""Symmetric per-channel weight quantization: int8 (default) and
fp8 e4m3 (the north-star's second weight format, BASELINE.json
"INT8/FP8").

A quantized weight is a plain dict pytree ``{"q": int8|f8e4m3 [..., K, N],
"s": float32 [..., N]}`` — per *output channel* scales, so the matmul can
defer dequantization to one row-scale after the MXU ((x @ q) * s, see
``kernels/int8_matmul.py``; dispatch is on ``q``'s dtype). Stacked layer
weights ``[L, K, N]`` quantize per ``(L, N)``. Norm weights / biases /
embeddings stay in the model dtype (embedding rows feed ``take``, not
the MXU).

int8 vs fp8 at equal bytes/weight: int8 is a 255-level UNIFORM grid per
channel; e4m3 is a float grid (3 mantissa bits → ≤6% relative step near
the top of each binade) whose extra dynamic range per element is wasted
when a per-channel scale already normalizes the range. Expect int8 to be
the quality-better format and fp8 to be speed-identical (both 1
byte/weight; v5e's MXU computes in bf16 either way) — measured numbers
in docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

QUANT_LEAF_Q = "q"
QUANT_LEAF_S = "s"

FP8_E4M3_MAX = 448.0  # largest normal in float8_e4m3fn

# 2D-or-stacked matmul weights eligible for quantization, per family.
LLAMA_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
OPT_QUANT_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")


def is_quantized_leaf(w) -> bool:
    return isinstance(w, dict) and QUANT_LEAF_Q in w and QUANT_LEAF_S in w


def quantize_tensor(w: jax.Array, fmt: str = "int8") -> dict:
    """Quantize ``[..., K, N]`` over K (reduction axis) -> per-N scales.

    ``fmt``: "int8" (symmetric uniform) or "fp8_e4m3" (per-channel scale
    to the e4m3 range, elementwise float rounding).
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., N]
    if fmt == "fp8_e4m3":
        scale = jnp.maximum(amax / FP8_E4M3_MAX, 1e-8)
        q = (wf / scale[..., None, :]).astype(jnp.float8_e4m3fn)
    elif fmt == "int8":
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    else:
        raise ValueError(f"unknown weight-quant fmt {fmt!r}")
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
    fmt: str = "int8",
) -> dict:
    """Quantize the matmul weights of a llama/opt param tree in place-shape.

    ``lm_head`` is stored ``[V, H]`` and consumed as ``h @ head.T``; when
    quantized it is re-laid-out to ``{"q": [H, V], "s": [V]}`` so the same
    kernel serves it (the model dispatches on the dict form).
    ``fmt`` selects the weight format ("int8" / "fp8_e4m3").
    """
    keys = set(
        (LLAMA_QUANT_KEYS if family == "llama" else OPT_QUANT_KEYS) + tuple(extra_keys)
    )
    out = dict(params)
    out["layers"] = {
        k: (quantize_tensor(v, fmt) if k in keys else v)
        for k, v in params["layers"].items()
    }
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_tensor(
            jnp.swapaxes(params["lm_head"], -1, -2), fmt)
    return out


def quantized_bytes(params: dict) -> int:
    """HBM footprint of a param tree (for bench reporting)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
