"""Paged KV cache: a shared block pool + per-request block tables.

The slot scheduler (serve/scheduler.py) gives every slot a contiguous
``max_total_len`` stripe of cache, so HBM is budgeted for the *worst-case*
length of every slot simultaneously — a 2048-token-capable slot costs 2048
positions of KV even while serving a 64-token chat turn. This module is
the vLLM-style TPU answer (and the BASELINE.json north-star item
"quantized paged KV-cache"): cache positions live in fixed-size **pages**
drawn from one shared pool, and a request holds only the pages its actual
length needs. Under a mixed-length workload the same HBM admits far more
concurrent requests.

Nothing like this exists in the reference — its cache is a per-request
HF tuple trimmed by tensor slicing (/root/reference/sampling/
kvcache_model.py:359-436, SURVEY.md §2.2); paging is only possible
*because* of the static-shape redesign (cache/kvcache.py).

Layout (per model):
  * pools ``k/v: [L, N_blocks, H_kv, page, D]`` (int8 variant adds
    per-position scales ``[L, N_blocks, H_kv, page]``) — allocated once;
  * ``block_tables: [B, max_pages]`` int32 — request row b's position
    ``p`` lives in pool block ``block_tables[b, p // page]`` at offset
    ``p % page``;
  * ``lengths: [B]`` int32 — per-row live positions (the per-row analogue
    of KVCache.length; rollback is still just a pointer move).

The block *allocator* is host-side (``PageAllocator``): allocation
happens at request admission, which is already a host decision — the
device never sees the free list, so every device program stays
static-shape. Reads/writes on device are gathers/scatters driven by the
block table; attention either gathers pages into a contiguous view (XLA
fallback, used on CPU/tests) or DMAs pages directly from the pool via the
paged flash-decode kernel (kernels/flash_decode.py paged variant).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .kvcache import _quantize_kv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Dense paged cache. ``k``/``v``: [L, N_blocks, H_kv, page, D];
    ``block_tables``: [B, max_pages] int32; ``lengths``: [B] int32."""

    k: jax.Array
    v: jax.Array
    block_tables: jax.Array
    lengths: jax.Array

    @property
    def page(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.block_tables.shape[0]

    @property
    def max_pages(self) -> int:
        return self.block_tables.shape[1]

    # per-row analogue of KVCache.length (models read this for positions)
    @property
    def length(self) -> jax.Array:
        return self.lengths


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantPagedKVCache:
    """Int8 paged cache: pools int8 + fp32 per-(block, head, position)
    scales — the north-star "quantized paged KV-cache". Same table/length
    semantics as :class:`PagedKVCache`."""

    k_q: jax.Array  # [L, N, H, page, D] int8
    v_q: jax.Array
    k_s: jax.Array  # [L, N, H, page] f32
    v_s: jax.Array
    block_tables: jax.Array
    lengths: jax.Array

    @property
    def page(self) -> int:
        return self.k_q.shape[3]

    @property
    def batch(self) -> int:
        return self.block_tables.shape[0]

    @property
    def max_pages(self) -> int:
        return self.block_tables.shape[1]

    @property
    def length(self) -> jax.Array:
        return self.lengths


def init_paged_cache(
    num_layers: int,
    num_blocks: int,
    num_kv_heads: int,
    page: int,
    head_dim: int,
    batch: int,
    max_pages: int,
    dtype=jnp.bfloat16,
    quant: bool = False,
):
    """Allocate the pool and an all-invalid table (block id ``num_blocks``
    is the out-of-range sentinel: scatters drop it, gathers clip to a
    garbage block that masking hides)."""
    shape = (num_layers, num_blocks, num_kv_heads, page, head_dim)
    tables = jnp.full((batch, max_pages), num_blocks, jnp.int32)
    lengths = jnp.zeros((batch,), jnp.int32)
    if quant:
        return QuantPagedKVCache(
            k_q=jnp.zeros(shape, jnp.int8),
            v_q=jnp.zeros(shape, jnp.int8),
            k_s=jnp.zeros(shape[:-1], jnp.float32),
            v_s=jnp.zeros(shape[:-1], jnp.float32),
            block_tables=tables,
            lengths=lengths,
        )
    return PagedKVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        block_tables=tables, lengths=lengths,
    )


def is_paged(cache) -> bool:
    return isinstance(cache, (PagedKVCache, QuantPagedKVCache))


def rollback_rows(cache, new_lengths: jax.Array):
    """Per-row truncation: the pointer moves, no data does (the paged
    analogue of kvcache.rollback / reference rollback,
    kvcache_model.py:359)."""
    return dataclasses.replace(cache, lengths=jnp.asarray(new_lengths, jnp.int32))


# ----------------------------------------------------------------- device ops

def _dest_indices(block_tables, lengths, s_new: int, page: int):
    """(blk [B,S], off [B,S]) pool coordinates for the next ``s_new``
    positions of every row. Rows whose table entry is the sentinel yield
    out-of-range blocks (scatter mode="drop" discards them)."""
    pos = lengths[:, None] + jnp.arange(s_new, dtype=jnp.int32)[None, :]
    pidx = pos // page
    blk = jnp.take_along_axis(
        block_tables, jnp.clip(pidx, 0, block_tables.shape[1] - 1), axis=1
    )
    # positions beyond the table are pushed out of range -> dropped
    blk = jnp.where(pidx < block_tables.shape[1], blk, jnp.int32(2**30))
    return blk, pos % page


def pad_head_dim(rows: jax.Array, pool_d: int) -> jax.Array:
    """Zero-pad the trailing head_dim of fresh k/v rows up to the pool's
    (possibly wider) head dim.

    The pool may be allocated WIDER than the model's head_dim (the
    pad-to-128 lane rescue, kernels/flash_decode.py should_use_paged
    note): a D=64 draft pool padded to D=128 rides the native flash lane
    instead of the materializing XLA gather. Zero lanes are exact:
    q·k over the pad contributes 0 and v's pad writes 0s that the model
    slices back off."""
    d = rows.shape[-1]
    if d == pool_d:
        return rows
    pad = [(0, 0)] * (rows.ndim - 1) + [(0, pool_d - d)]
    return jnp.pad(rows, pad)


def paged_update_and_read_layer(
    slices: Tuple[jax.Array, ...],
    block_tables: jax.Array,
    lengths: jax.Array,
    k_new: jax.Array,  # [B, H, S, D]
    v_new: jax.Array,
    dtype,
    gather: bool = True,
):
    """Scatter the new block into the layer's pool slices, then (optionally)
    gather each row's pages into a contiguous [B, H, max_pages*page, D]
    view for XLA attention. With ``gather=False`` (paged flash kernel path)
    only the scatter happens and ``k_all/v_all`` are returned as None.

    Dense slices: ``(k_pool, v_pool)``; quant: ``(k_q, k_s, v_q, v_s)``.
    """
    b, h, s, d = k_new.shape
    page = slices[0].shape[2]
    blk, off = _dest_indices(block_tables, lengths, s, page)
    # Index the head dim explicitly (window = D only, or scalar for the
    # scales): a scatter whose update window is (H, D) — two NON-adjacent
    # pool dims — makes XLA's layout assignment prefer a transposed pool
    # layout ({4,2,3,1,0}: physical [L,N,page,H,D]), which conflicts with
    # the paged flash kernel's default-layout operand and costs two live
    # full-pool copies per program (measured: 2x800 MB at 13B geometry).
    # Per-(position, head) points with a D-row window keep the default
    # layout optimal for both.
    h_idx = jnp.arange(h, dtype=jnp.int32)[None, None, :]
    blk3, off3 = blk[:, :, None], off[:, :, None]

    def scatter(pool, rows):
        # pool [N, H, page, D?]; rows [B, S, H, D?] -> write (blk, h, off)
        return pool.at[blk3, h_idx, off3].set(rows.astype(pool.dtype), mode="drop")

    kt = k_new.transpose(0, 2, 1, 3)  # [B, S, H, D]
    vt = v_new.transpose(0, 2, 1, 3)
    pool_d = slices[0].shape[-1]
    if len(slices) == 4:
        k_q, k_s, v_q, v_s = slices
        kq, ks = _quantize_kv(kt)  # scales over the REAL D, pad after
        vq, vs = _quantize_kv(vt)
        kq, vq = pad_head_dim(kq, pool_d), pad_head_dim(vq, pool_d)
        k_q = scatter(k_q, kq)
        v_q = scatter(v_q, vq)
        k_s = k_s.at[blk3, h_idx, off3].set(ks, mode="drop")
        v_s = v_s.at[blk3, h_idx, off3].set(vs, mode="drop")
        new_slices = (k_q, k_s, v_q, v_s)
        if not gather:
            return new_slices, None, None
        k_all = _gather_view_quant(k_q, k_s, block_tables, dtype)
        v_all = _gather_view_quant(v_q, v_s, block_tables, dtype)
        return new_slices, k_all, v_all
    k_pool, v_pool = slices
    k_pool = scatter(k_pool, pad_head_dim(kt, pool_d))
    v_pool = scatter(v_pool, pad_head_dim(vt, pool_d))
    if not gather:
        return (k_pool, v_pool), None, None
    return (k_pool, v_pool), _gather_view(k_pool, block_tables, dtype), _gather_view(
        v_pool, block_tables, dtype
    )


def paged_write_layers(cache, k_stack: jax.Array, v_stack: jax.Array):
    """One deferred scatter of ALL layers' new k/v ``[L, B, S, H_kv, D]``
    into the pools at each row's next ``S`` positions.

    This exists so the model's layer scan can keep the pools READ-ONLY:
    a per-layer scatter inside ``lax.scan`` makes the stacked pool both a
    scan input and a scan output, and (with the flash kernel's
    custom-call in between) XLA cannot alias the two — it holds TWO live
    full-pool buffers (measured: 2 x 800 MB at Llama-2-13B geometry,
    the difference between fitting on one v5e chip and OOM). The flash
    kernel never reads the new block from the pool (it attends to it in
    VMEM), so the write can happen once, after the scan, in-place.

    Returns the cache with pools updated; ``lengths`` unchanged (the
    caller advances them via :func:`paged_rebuild` / ``dataclasses.replace``).
    """
    l, b, s, hh, d = k_stack.shape
    pool_d = (cache.k_q if isinstance(cache, QuantPagedKVCache) else cache.k).shape[-1]
    blk, off = _dest_indices(cache.block_tables, cache.lengths, s, cache.page)
    l_idx = jnp.arange(l, dtype=jnp.int32)[:, None, None, None]
    h_idx = jnp.arange(hh, dtype=jnp.int32)[None, None, None, :]
    blk4, off4 = blk[None, :, :, None], off[None, :, :, None]

    def scat(pool, rows):
        return pool.at[l_idx, blk4, h_idx, off4].set(
            rows.astype(pool.dtype), mode="drop"
        )

    if isinstance(cache, QuantPagedKVCache):
        kq, ks = _quantize_kv(k_stack)
        vq, vs = _quantize_kv(v_stack)
        kq, vq = pad_head_dim(kq, pool_d), pad_head_dim(vq, pool_d)
        return dataclasses.replace(
            cache,
            k_q=scat(cache.k_q, kq), v_q=scat(cache.v_q, vq),
            k_s=cache.k_s.at[l_idx, blk4, h_idx, off4].set(ks, mode="drop"),
            v_s=cache.v_s.at[l_idx, blk4, h_idx, off4].set(vs, mode="drop"),
        )
    return dataclasses.replace(
        cache,
        k=scat(cache.k, pad_head_dim(k_stack, pool_d)),
        v=scat(cache.v, pad_head_dim(v_stack, pool_d)),
    )


def _gather_view(pool: jax.Array, block_tables: jax.Array, dtype) -> jax.Array:
    """[N, H, page, D] + [B, P] -> [B, H, P*page, D] contiguous view (XLA
    fallback; the paged flash kernel reads the pool directly instead)."""
    n = pool.shape[0]
    g = pool[jnp.clip(block_tables, 0, n - 1)]  # [B, P, H, page, D]
    b, p, h, pg, d = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(b, h, p * pg, d).astype(dtype)


def _gather_view_quant(pool_q, pool_s, block_tables, dtype) -> jax.Array:
    n = pool_q.shape[0]
    idx = jnp.clip(block_tables, 0, n - 1)
    g = pool_q[idx].astype(jnp.float32) * pool_s[idx][..., None]  # [B,P,H,page,D]
    b, p, h, pg, d = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(b, h, p * pg, d).astype(dtype)


def paged_layer_scan_slices(cache):
    """Per-layer pytree (leading L axis) for ``lax.scan`` — the paged
    analogue of kvcache.layer_scan_slices."""
    if isinstance(cache, QuantPagedKVCache):
        return (cache.k_q, cache.k_s, cache.v_q, cache.v_s)
    return (cache.k, cache.v)


def paged_rebuild(cache, new_slices, new_lengths):
    if isinstance(cache, QuantPagedKVCache):
        k_q, k_s, v_q, v_s = new_slices
        return QuantPagedKVCache(
            k_q=k_q, v_q=v_q, k_s=k_s, v_s=v_s,
            block_tables=cache.block_tables,
            lengths=jnp.asarray(new_lengths, jnp.int32),
        )
    return PagedKVCache(
        k=new_slices[0], v=new_slices[1],
        block_tables=cache.block_tables,
        lengths=jnp.asarray(new_lengths, jnp.int32),
    )


def set_row_table(cache, row: jax.Array, table_row: jax.Array, length):
    """Install a request's block table into row ``row`` (admission) and
    reset its length. ``table_row``: [max_pages] int32 (sentinel-padded)."""
    return dataclasses.replace(
        cache,
        block_tables=cache.block_tables.at[row].set(table_row),
        lengths=cache.lengths.at[row].set(jnp.asarray(length, jnp.int32)),
    )


# ------------------------------------------------------------------- host side

class PageAllocator:
    """Host-side free-list allocator over the pool's block ids.

    Allocation/free happen at request admission/harvest (host decisions
    already), so device programs never see the free list. Block id
    ``num_blocks`` (out of range) is the sentinel for unused table slots.
    """

    def __init__(self, num_blocks: int, page: int, max_pages: int):
        self.num_blocks = num_blocks
        self.page = page
        self.max_pages = max_pages
        self._free: List[int] = list(range(num_blocks - 1, -1, -1))

    @property
    def free_blocks(self) -> int:
        return len(self._free)

    def pages_needed(self, total_len: int) -> int:
        return -(-total_len // self.page)

    def alloc(self, total_len: int) -> Optional[List[int]]:
        """Reserve blocks for a request of ``total_len`` max positions;
        None if the pool can't satisfy it (caller keeps the request
        queued)."""
        n = self.pages_needed(total_len)
        if n > self.max_pages or n > len(self._free):
            return None
        return [self._free.pop() for _ in range(n)]

    def alloc_one(self) -> Optional[int]:
        """One more block for a GROWING request (on-demand paging: the
        engine appends pages as a sequence's length crosses page
        boundaries instead of reserving its worst case up front)."""
        return self._free.pop() if self._free else None

    def free(self, blocks: List[int]) -> None:
        self._free.extend(reversed(blocks))

    def table_row(self, blocks: List[int]):
        import numpy as np

        row = np.full((self.max_pages,), self.num_blocks, np.int32)
        row[: len(blocks)] = blocks
        return row


def prompt_page_hashes(prompt_ids, page: int, reserve_tail: int = 2) -> List[bytes]:
    """Chained content hashes of a prompt's *shareable* full pages.

    Page ``i``'s hash covers every token up to position ``(i+1)*page`` (a
    chain — a page is only reusable under an identical full prefix, which
    also makes the absolute RoPE positions match). The last
    ``reserve_tail`` prompt positions are never shareable: the draft
    phase re-feeds ``cur_len - 2`` onward (serve/paged.py
    _draft_phase_batched), re-writing those positions in pages the
    request must own exclusively.
    """
    import hashlib

    import numpy as np

    ids = np.asarray(prompt_ids, np.int32).reshape(-1)
    n_shareable = max(ids.shape[0] - reserve_tail, 0) // page
    out: List[bytes] = []
    h = hashlib.sha256()
    for i in range(n_shareable):
        h.update(ids[i * page : (i + 1) * page].tobytes())
        out.append(h.digest())
    return out


class SharedPageAllocator(PageAllocator):
    """Refcounted allocator with a prefix-page registry (vLLM-style
    automatic prefix caching, TPU-host edition).

    A request's leading full prompt pages may be SHARED with earlier
    requests whose prompt has the same prefix (chained content hash ==
    same tokens AND same absolute positions): ``lookup`` returns the
    longest cached page chain to reference instead of recomputing its KV.
    Freed registered pages are not returned to the free list but parked
    in an LRU *evictable* pool, reclaimed only under allocation pressure —
    so a hot system prompt's KV survives between requests.

    Everything is host-side bookkeeping over block ids; device programs
    still only ever see block tables.
    """

    def __init__(self, num_blocks: int, page: int, max_pages: int):
        super().__init__(num_blocks, page, max_pages)
        self._ref = {}            # block -> live refcount
        self._by_hash = {}        # page-chain hash -> block
        self._block_hash = {}     # block -> its registry hash
        self._evictable = {}      # block -> None; dict order = LRU
        self.hits = 0             # pages served from the registry
        self.misses = 0           # shareable pages that had to compute

    # ---- capacity ---------------------------------------------------
    @property
    def available_blocks(self) -> int:
        return len(self._free) + len(self._evictable)

    def _take_block(self) -> Optional[int]:
        if self._free:
            return self._free.pop()
        if self._evictable:
            blk = next(iter(self._evictable))  # LRU = oldest insertion
            del self._evictable[blk]
            h = self._block_hash.pop(blk, None)
            if h is not None:
                self._by_hash.pop(h, None)
            return blk
        return None

    # ---- admission --------------------------------------------------
    def lookup(self, hashes: List[bytes]) -> List[int]:
        """Longest prefix of ``hashes`` present in the registry -> blocks."""
        chain: List[int] = []
        for h in hashes:
            blk = self._by_hash.get(h)
            if blk is None:
                break
            chain.append(blk)
        return chain

    def alloc_shared(
        self, total_len: int, hashes: List[bytes]
    ) -> Optional[Tuple[List[int], int]]:
        """Reserve pages for a request, reusing the longest cached prefix
        chain. Returns ``(blocks, cached_len)`` — the first
        ``cached_len // page`` blocks are shared (their KV already sits in
        the pool); the rest are fresh. None if capacity is short."""
        n = self.pages_needed(total_len)
        if n > self.max_pages:
            return None
        shared = self.lookup(hashes)[:n]
        n_own = n - len(shared)
        if n_own > self.available_blocks:
            return None
        blocks = []
        for blk in shared:
            # revive from evictable if parked; bump ref
            self._evictable.pop(blk, None)
            self._ref[blk] = self._ref.get(blk, 0) + 1
            blocks.append(blk)
        for _ in range(n_own):
            blk = self._take_block()
            assert blk is not None  # guarded by available_blocks above
            self._ref[blk] = 1
            blocks.append(blk)
        self.hits += len(shared)
        self.misses += max(min(len(hashes), n) - len(shared), 0)
        return blocks, len(shared) * self.page

    def alloc(self, total_len: int) -> Optional[List[int]]:
        """PageAllocator-compatible allocation (no sharing)."""
        got = self.alloc_shared(total_len, [])
        return got[0] if got is not None else None

    def alloc_one(self) -> Optional[int]:
        """On-demand growth block (may evict a parked registry page)."""
        blk = self._take_block()
        if blk is not None:
            self._ref[blk] = 1
        return blk

    def register(self, hashes: List[bytes], blocks: List[int]) -> None:
        """Publish a request's computed prefix pages (block ``i`` holds
        the page whose chain hash is ``hashes[i]``). First writer wins —
        a concurrent identical prompt keeps its private copy unpublished."""
        for h, blk in zip(hashes, blocks):
            if h in self._by_hash or blk in self._block_hash:
                continue
            self._by_hash[h] = blk
            self._block_hash[blk] = h

    def free(self, blocks: List[int]) -> None:
        """Drop one reference per block; registered blocks park in the
        evictable LRU instead of the free list."""
        for blk in blocks:
            r = self._ref.get(blk, 1) - 1
            if r > 0:
                self._ref[blk] = r
                continue
            self._ref.pop(blk, None)
            if blk in self._block_hash:
                self._evictable.pop(blk, None)
                self._evictable[blk] = None  # most-recently-used position
            else:
                self._free.append(blk)
