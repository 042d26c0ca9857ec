"""Pallas fused int8-dequant + matmul (the TPU 'native kernel' layer).

The reference consumes pre-quantized GPTQ/AWQ checkpoints through
third-party CUDA kernels (/root/reference/experiment_multi.py:218-223,
evaluate_chat.py:119-125); there are no in-repo kernels. On TPU the
equivalent is this Pallas (Mosaic) kernel: weights live in HBM as int8
with per-output-channel fp32 scales, each grid step DMAs an int8 tile
into VMEM, widens it next to the MXU, and accumulates in fp32 — the
bf16 weight tensor is never materialized in HBM, so weight-bandwidth
(the decode bottleneck) is halved.

Layout: ``x [M, K] (bf16/f32) @ w_q [K, N] (int8) * scale [N] (f32)``.
Grid is ``(M/bm, N/bn, K/bk)`` with K innermost; a VMEM fp32 scratch
accumulates across K steps and the per-channel scale is applied once on
the final step (dequant is algebraically deferred: (x @ w_q) * s).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Widen the int8 tile in VMEM; MXU runs bf16 x bf16 -> fp32.
    w = w_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def _int8_matmul_2d(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    *,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    mp, kp, np_ = _round_up(m, block_m), _round_up(k, block_k), _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))
    scale2d = scale.reshape(1, np_).astype(jnp.float32)

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, h: (i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, h: (h, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, h: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, h: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale2d)
    return out[:m, :n]


def use_pallas() -> bool:
    """Default OFF: measured end-to-end on v5e, XLA's fused convert+dot
    beats this kernel at decode shapes (413 vs 273 tok/s AR int8 — the
    per-call overhead of ~113 pallas_calls/forward outweighs the DMA win;
    scripts/exp_int8_dispatch.py). The kernel remains available for
    explicit use (LLMSS_FORCE_PALLAS=1) and as the int8 building block the
    flash-decode attention kernel shares its layout with."""
    return os.environ.get("LLMSS_FORCE_PALLAS") == "1"


def int8_matmul_ref(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA reference path: dequant deferred the same way ((x@w_q)*s)."""
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (y * scale.astype(jnp.float32)[None, :]).astype(x.dtype)


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    force_ref: bool = False,
) -> jax.Array:
    """``x [..., K] @ dequant(w_q [K, N], scale [N]) -> [..., N]``.

    ``w_q`` may be int8 or float8_e4m3fn (quant/core.py fmt) — both are
    1 byte/weight, widened to bf16 beside the MXU. fp8 always takes the
    XLA fused convert+dot path (the Pallas tile widen is written for
    int8; measured on v5e the XLA path wins at decode shapes anyway —
    see use_pallas)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if w_q.dtype != jnp.int8:
        force_ref = True
    if force_ref or (not interpret and not use_pallas()):
        out = int8_matmul_ref(x2, w_q, scale)
    else:
        bm = min(block_m, _round_up(m, 16))
        bn = min(block_n, _round_up(w_q.shape[1], 128))
        bk = min(block_k, _round_up(k, 128))
        out = _int8_matmul_2d(
            x2, w_q, scale, block_m=bm, block_n=bn, block_k=bk, interpret=interpret
        )
    return out.reshape(*lead, w_q.shape[1])
