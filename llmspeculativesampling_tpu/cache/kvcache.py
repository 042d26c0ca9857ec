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


def rollback(cache: KVCache, new_length) -> KVCache:
    """Truncate to ``new_length`` positions. O(1): only the pointer moves.

    Parity: KVCacheModel.rollback(end_pos) (kvcache_model.py:359-436) minus
    the tensor slicing.
    """
    return KVCache(cache.k, cache.v, jnp.asarray(new_length, jnp.int32))


def select_rows(cache: KVCache, row_idx: jax.Array) -> KVCache:
    """Gather/duplicate batch rows (reference ``copy_cache_index`` /
    ``rollback(..., choice)``, kvcache_model.py:193-200,399-427).

    ``row_idx``: int32 [new_batch]; output batch = len(row_idx) (static).
    """
    return KVCache(
        k=jnp.take(cache.k, row_idx, axis=1),
        v=jnp.take(cache.v, row_idx, axis=1),
        length=cache.length,
    )


def repeat_rows(cache: KVCache, repeats: int) -> KVCache:
    """Duplicate every row ``repeats`` times (reference cache ``repeat`` for
    beam expansion, kvcache_model.py:184-192)."""
    return KVCache(
        k=jnp.repeat(cache.k, repeats, axis=1),
        v=jnp.repeat(cache.v, repeats, axis=1),
        length=cache.length,
    )


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
    b = cache.batch
    t = path_idx.shape[1]
    src = prefix_len + path_idx  # [B, T] absolute source positions
    # Gather [L,B,H,T,D] from [L,B,H,S_max,D] using per-(B) indices.
    idx = src[None, :, None, :, None]
    idx = jnp.broadcast_to(idx, (cache.k.shape[0], b, cache.k.shape[2], t, cache.k.shape[4]))
    gathered_k = jnp.take_along_axis(cache.k, idx, axis=3)
    gathered_v = jnp.take_along_axis(cache.v, idx, axis=3)
    valid = path_valid[None, :, None, :, None]
    gathered_k = jnp.where(valid, gathered_k, 0)
    gathered_v = jnp.where(valid, gathered_v, 0)
    zero = jnp.zeros((), jnp.int32)
    start = jnp.asarray(prefix_len, jnp.int32)
    k = jax.lax.dynamic_update_slice(cache.k, gathered_k, (zero, zero, zero, start, zero))
    v = jax.lax.dynamic_update_slice(cache.v, gathered_v, (zero, zero, zero, start, zero))
    new_len = prefix_len + jnp.sum(path_valid[0].astype(jnp.int32))
    return KVCache(k, v, jnp.asarray(new_len, jnp.int32))
