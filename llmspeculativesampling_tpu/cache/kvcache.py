"""Static-shape KV cache with O(1) rollback (the L2 re-imagination).

The reference's ``KVCacheModel`` (/root/reference/sampling/kvcache_model.py)
mutates HF tuple caches by *slicing tensors* on every rollback
(kvcache_model.py:359-436) and re-allocates when the batch grows
(:184-200). On TPU under XLA both are poison: dynamic shapes force
recompiles and reallocation burns HBM bandwidth.

Design here:
  * ``k``/``v`` are fixed ``[L, B, H_kv, S_max, D]`` buffers allocated once.
  * ``length`` is an int32 scalar *pointer*: positions ``>= length`` are
    dead. Rollback (kvcache_model.py:359) is a scalar replacement — zero
    data movement, zero recompiles.
  * Batch-row duplication / selection (the reference's ``copy_cache_index``
    gather, kvcache_model.py:193-200, and ``rollback(..., choice)``)
    becomes a static-shape ``take`` over the batch axis.
  * Tree-path compaction (``rollback_tree_attention``,
    kvcache_model.py:326-356) becomes a ``take_along_axis`` over the
    sequence axis with a precomputed index map + new length.

All functions are pure; the cache is a pytree that flows through jit with
buffer donation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-model KV cache. ``k``/``v``: [num_layers, batch, kv_heads, max_len, head_dim]."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # int32 scalar: number of live positions

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    max_len: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
    )


def rollback(cache, new_length):
    """Truncate to ``new_length`` positions. O(1): only the pointer moves.

    Parity: KVCacheModel.rollback(end_pos) (kvcache_model.py:359-436) minus
    the tensor slicing. Works on dense and quantized caches.
    """
    return _map_kv(cache, lambda x: x, length=new_length)


def select_rows(cache, row_idx: jax.Array):
    """Gather/duplicate batch rows (reference ``copy_cache_index`` /
    ``rollback(..., choice)``, kvcache_model.py:193-200,399-427).

    ``row_idx``: int32 [new_batch]; output batch = len(row_idx) (static).
    """
    return _map_kv(cache, lambda x: jnp.take(x, row_idx, axis=1))


def repeat_rows(cache, repeats: int):
    """Duplicate every row ``repeats`` times (reference cache ``repeat`` for
    beam expansion, kvcache_model.py:184-192)."""
    return _map_kv(cache, lambda x: jnp.repeat(x, repeats, axis=1))


def write_layer(
    cache_k_l: jax.Array,
    cache_v_l: jax.Array,
    start: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Write ``S`` new positions into one layer's buffers at ``start``.

    ``cache_[kv]_l``: [B, H_kv, S_max, D]; ``[kv]_new``: [B, H_kv, S, D].
    ``start`` is a traced int32 scalar — a dynamic_update_slice, not a copy
    of the whole buffer.
    """
    start = jnp.asarray(start, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    k = jax.lax.dynamic_update_slice(cache_k_l, k_new.astype(cache_k_l.dtype), (zero, zero, start, zero))
    v = jax.lax.dynamic_update_slice(cache_v_l, v_new.astype(cache_v_l.dtype), (zero, zero, start, zero))
    return k, v


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVCache:
    """Int8 KV cache: halves decode-attention HBM traffic (the bandwidth
    bottleneck on the big target model). ``k_q``/``v_q``: int8
    [L, B, H_kv, S_max, D]; ``k_s``/``v_s``: fp32 per-(position, head)
    scales [L, B, H_kv, S_max]. Dequant happens next to the attention
    consumer so the bf16 cache never lands in HBM (XLA fuses the widen
    into the score/context matmuls).

    Same O(1)-rollback semantics as :class:`KVCache` — the reference's
    GPTQ/AWQ loading (experiment_multi.py:218-223) has no KV-cache
    quantization at all; this is a TPU-build value-add.
    """

    k_q: jax.Array
    v_q: jax.Array
    k_s: jax.Array
    v_s: jax.Array
    length: jax.Array

    @property
    def max_len(self) -> int:
        return self.k_q.shape[3]

    @property
    def batch(self) -> int:
        return self.k_q.shape[1]


def init_quant_cache(
    num_layers: int, batch: int, num_kv_heads: int, max_len: int, head_dim: int
) -> QuantKVCache:
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    return QuantKVCache(
        k_q=jnp.zeros(shape, jnp.int8),
        v_q=jnp.zeros(shape, jnp.int8),
        k_s=jnp.zeros(shape[:-1], jnp.float32),
        v_s=jnp.zeros(shape[:-1], jnp.float32),
        length=jnp.zeros((), jnp.int32),
    )


def _quantize_kv(x: jax.Array):
    """Per-(b, h, position) symmetric int8 over the head_dim axis."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def write_layer_quant(
    k_q_l: jax.Array,
    k_s_l: jax.Array,
    v_q_l: jax.Array,
    v_s_l: jax.Array,
    start: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
):
    """Quantize + write ``S`` new positions into one layer's int8 buffers.

    ``k_q_l``: [B, H, S_max, D]; ``k_s_l``: [B, H, S_max]; ``k_new``:
    [B, H, S, D] (same for v). Returns updated buffers."""
    start = jnp.asarray(start, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    kq, ks = _quantize_kv(k_new)
    vq, vs = _quantize_kv(v_new)
    k_q_l = jax.lax.dynamic_update_slice(k_q_l, kq, (zero, zero, start, zero))
    v_q_l = jax.lax.dynamic_update_slice(v_q_l, vq, (zero, zero, start, zero))
    k_s_l = jax.lax.dynamic_update_slice(k_s_l, ks, (zero, zero, start))
    v_s_l = jax.lax.dynamic_update_slice(v_s_l, vs, (zero, zero, start))
    return k_q_l, k_s_l, v_q_l, v_s_l


def dequant_layer(q: jax.Array, s: jax.Array, dtype) -> jax.Array:
    """[B, H, S_max, D] int8 × [B, H, S_max] -> dtype (fused by XLA into
    the attention matmuls; never materialized in HBM)."""
    return (q.astype(jnp.float32) * s[..., None]).astype(dtype)


def layer_scan_slices(cache):
    """Per-layer pytree (leading L axis) for ``lax.scan`` over the decoder.

    Dense: (k, v); quantized: (k_q, k_s, v_q, v_s). Model code pairs this
    with :func:`update_and_read_layer` and :func:`rebuild` so one decoder
    body serves both cache kinds (dispatch is trace-time static).
    """
    if isinstance(cache, QuantKVCache):
        return (cache.k_q, cache.k_s, cache.v_q, cache.v_s)
    return (cache.k, cache.v)


def update_and_read_layer(slices, length, k_new, v_new, dtype):
    """Write the new block then return (new_slices, k_all, v_all) with
    k_all/v_all in compute dtype [B, H, S_max, D]."""
    if len(slices) == 4:
        k_q_l, k_s_l, v_q_l, v_s_l = slices
        k_q_l, k_s_l, v_q_l, v_s_l = write_layer_quant(
            k_q_l, k_s_l, v_q_l, v_s_l, length, k_new, v_new
        )
        return (
            (k_q_l, k_s_l, v_q_l, v_s_l),
            dequant_layer(k_q_l, k_s_l, dtype),
            dequant_layer(v_q_l, v_s_l, dtype),
        )
    k_l, v_l = write_layer(slices[0], slices[1], length, k_new, v_new)
    return (k_l, v_l), k_l, v_l


def rebuild(cache, new_slices, new_length):
    """Reassemble a cache of the same kind from scanned layer slices."""
    if isinstance(cache, QuantKVCache):
        k_q, k_s, v_q, v_s = new_slices
        return QuantKVCache(
            k_q=k_q, v_q=v_q, k_s=k_s, v_s=v_s,
            length=jnp.asarray(new_length, jnp.int32),
        )
    return KVCache(new_slices[0], new_slices[1], jnp.asarray(new_length, jnp.int32))


def _map_kv(cache, fn_data, fn_scale=None, length=None):
    """Apply the same transform to every KV buffer (scales get
    ``fn_scale`` or ``fn_data`` without the trailing-D axis handling)."""
    length = cache.length if length is None else jnp.asarray(length, jnp.int32)
    if isinstance(cache, QuantKVCache):
        fs = fn_scale or fn_data
        return QuantKVCache(
            fn_data(cache.k_q), fn_data(cache.v_q), fs(cache.k_s), fs(cache.v_s), length
        )
    return KVCache(fn_data(cache.k), fn_data(cache.v), length)


def compact_tree_paths(
    cache: KVCache,
    path_idx: jax.Array,
    path_valid: jax.Array,
    prefix_len: jax.Array,
) -> KVCache:
    """Compact a tree-layout tail to one accepted path per row.

    Reference: ``rollback_tree_attention(input_idx, mask)``
    (kvcache_model.py:326-356) gathers accepted rows and boolean-masks the
    sequence dim host-side. Statically: positions ``< prefix_len`` are kept
    in place; the tail is re-ordered so that the accepted tree nodes (given
    by ``path_idx`` into the tail, with ``path_valid`` flags) become
    contiguous. New length = prefix_len + sum(path_valid).

    Args:
      path_idx:   int32 [B, T] — for each output tail slot, the source tail
                  offset of the accepted node (tail-relative).
      path_valid: bool  [B, T] — whether the slot holds a real node.
      prefix_len: int32 scalar — length of the shared prefix.
    Returns cache with rows compacted and length updated.
    """
    t = path_idx.shape[1]
    src = prefix_len + path_idx  # [B, T] absolute source positions
    zero = jnp.zeros((), jnp.int32)
    start = jnp.asarray(prefix_len, jnp.int32)

    def compact(buf):
        # buf: [L, B, H, S_max, D] (data) or [L, B, H, S_max] (scales);
        # gather T accepted positions per row, zero invalid, write back.
        has_d = buf.ndim == 5
        shape = (buf.shape[0], buf.shape[1], buf.shape[2], t) + buf.shape[4:]
        idx = src[None, :, None, :, None] if has_d else src[None, :, None, :]
        idx = jnp.broadcast_to(idx, shape)
        gathered = jnp.take_along_axis(buf, idx, axis=3)
        valid = path_valid[None, :, None, :, None] if has_d else path_valid[None, :, None, :]
        gathered = jnp.where(valid, gathered, 0)
        offsets = (zero, zero, zero, start, zero)[: buf.ndim]
        return jax.lax.dynamic_update_slice(buf, gathered, offsets)

    new_len = prefix_len + jnp.sum(path_valid[0].astype(jnp.int32))
    return _map_kv(cache, compact, length=new_len)
