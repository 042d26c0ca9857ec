"""Paged KV cache (cache/paged.py): pool write/gather semantics, per-row
heterogeneous-length batched forwards vs per-row dense references, the int8
paged variant, and the host-side page allocator.

The reference has no paging (its cache is a per-request trimmed HF tuple,
kvcache_model.py:359-436); parity target is the *dense* path of this
framework itself: a batched paged forward must produce, per row, exactly
what a single-request contiguous-cache forward produces.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import rollback
from llmspeculativesampling_tpu.cache.paged import (
    PageAllocator,
    init_paged_cache,
    rollback_rows,
    set_row_table,
)
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama


def _cfg(**kw):
    d = dict(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position=256, dtype="float32",
    )
    d.update(kw)
    return LlamaConfig(**d)


def _mk(quant=False):
    cfg = _cfg()
    bundle = ModelBundle("llama", cfg, llama.forward)
    params = llama.init_params(cfg, jax.random.key(0))
    alloc = PageAllocator(num_blocks=16, page=16, max_pages=8)
    cache = init_paged_cache(
        cfg.num_layers, 16, cfg.num_kv_heads, 16, cfg.head_dim,
        batch=2, max_pages=8, dtype=cfg.jnp_dtype, quant=quant,
    )
    # non-contiguous, interleaved tables for the two rows
    t0 = alloc.alloc(4 * 16)
    t1 = alloc.alloc(4 * 16)
    cache = set_row_table(cache, 0, jnp.asarray(alloc.table_row(t0)), 0)
    cache = set_row_table(cache, 1, jnp.asarray(alloc.table_row(t1)), 0)
    return cfg, bundle, params, cache, alloc, (t0, t1)


def test_allocator_free_list():
    a = PageAllocator(num_blocks=8, page=16, max_pages=8)
    b1 = a.alloc(40)  # 3 pages
    assert len(b1) == 3 and a.free_blocks == 5
    assert a.alloc(16 * 6) is None  # 6 > 5 free
    a.free(b1)
    assert a.free_blocks == 8
    row = a.table_row([2, 5])
    assert row.shape == (8,) and row[0] == 2 and row[1] == 5 and row[2] == 8


@pytest.mark.parametrize("quant", [False, True])
def test_paged_forward_matches_dense_per_row(quant):
    """Batched paged decode with heterogeneous per-row lengths == two
    independent dense-cache runs (incl. a per-row rollback mid-stream)."""
    cfg, bundle, params, pcache, _, _ = _mk(quant=quant)
    fwd = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))

    rng = np.random.default_rng(0)
    prompts = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    steps = rng.integers(1, 250, size=(2, 3)).astype(np.int32)

    # paged: batched prefill + three batched 1-token steps
    logits_p, pcache = fwd(params, jnp.asarray(prompts), pcache)
    outs = [np.asarray(logits_p, np.float32)]
    for j in range(3):
        lj, pcache = fwd(params, jnp.asarray(steps[:, j : j + 1]), pcache)
        outs.append(np.asarray(lj, np.float32))
    # per-row rollback: row0 keeps 11, row1 rolls back to 9 and re-decodes
    pcache = rollback_rows(pcache, jnp.asarray([11, 9], jnp.int32))
    redo = rng.integers(1, 250, size=(2, 1)).astype(np.int32)
    l_redo, pcache = fwd(params, jnp.asarray(redo), pcache)
    np.testing.assert_array_equal(np.asarray(pcache.lengths), [12, 10])

    # dense reference per row (contiguous cache, batch=1)
    from llmspeculativesampling_tpu.cache.kvcache import (
        init_cache, init_quant_cache,
    )
    for r in range(2):
        dcache = (
            init_quant_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim)
            if quant
            else init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, cfg.jnp_dtype)
        )
        ld, dcache = fwd(params, jnp.asarray(prompts[r : r + 1]), dcache)
        np.testing.assert_allclose(
            np.asarray(ld, np.float32), outs[0][r : r + 1], rtol=2e-4, atol=2e-4
        )
        for j in range(3):
            lj, dcache = fwd(params, jnp.asarray(steps[r : r + 1, j : j + 1]), dcache)
            np.testing.assert_allclose(
                np.asarray(lj, np.float32), outs[j + 1][r : r + 1], rtol=2e-4, atol=2e-4
            )
        dcache = rollback(dcache, 11 if r == 0 else 9)
        lr, dcache = fwd(params, jnp.asarray(redo[r : r + 1]), dcache)
        np.testing.assert_allclose(
            np.asarray(lr, np.float32),
            np.asarray(l_redo, np.float32)[r : r + 1],
            rtol=2e-4, atol=2e-4,
        )


def test_paged_inactive_row_is_inert():
    """A row with a sentinel (unallocated) table neither corrupts the pool
    nor poisons other rows."""
    cfg, bundle, params, pcache, alloc, (t0, t1) = _mk()
    # row1 -> sentinel table (simulates a free slot lane)
    import dataclasses

    pcache = dataclasses.replace(
        pcache,
        block_tables=pcache.block_tables.at[1].set(alloc.num_blocks),
        lengths=pcache.lengths.at[1].set(0),
    )
    fwd = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))
    toks = np.asarray([[5, 6, 7, 8], [9, 10, 11, 12]], np.int32)
    l1, pcache = fwd(params, jnp.asarray(toks), pcache)

    # row0 result must equal a fresh single-row paged run
    cfg2, bundle2, params2, pc2, _, _ = _mk()
    l2, _ = jax.jit(lambda p, t, c: bundle2.forward(p, cfg2, t, c))(
        params, jnp.asarray(toks), pc2
    )
    np.testing.assert_allclose(
        np.asarray(l1, np.float32)[0], np.asarray(l2, np.float32)[0],
        rtol=2e-4, atol=2e-4,
    )
    # pool blocks owned by nobody (row1's would-be writes) stayed zero
    k = np.asarray(pcache.k, np.float32)
    used = set(t0)
    for blk in range(16):
        if blk not in used:
            assert np.all(k[:, blk] == 0.0), f"block {blk} dirtied"


@pytest.mark.parametrize("d,quant", [(128, False), (128, True), (64, False), (64, True)])
def test_paged_flash_kernel_matches_ref(d, quant):
    """Paged flash-decode kernel (interpret mode): DMA-by-block-table ==
    the jnp reference over the gathered contiguous view, incl. int8 pools
    and the lane-folded head_dim-64 layout."""
    from llmspeculativesampling_tpu.cache.kvcache import _quantize_kv
    from llmspeculativesampling_tpu.kernels.flash_decode import (
        flash_decode_ref,
        paged_flash_decode_attention,
    )

    b, hq, hkv, s_new, page, p = 2, 8, 4, 5, 128, 3
    n_blocks = 8
    ks = jax.random.split(jax.random.key(3), 5)
    q = jax.random.normal(ks[0], (b, hq, s_new, d), jnp.float32)
    kn = jax.random.normal(ks[1], (b, hkv, s_new, d), jnp.float32)
    vn = jax.random.normal(ks[2], (b, hkv, s_new, d), jnp.float32)
    k_pool_f = jax.random.normal(ks[3], (n_blocks, hkv, page, d), jnp.float32)
    v_pool_f = jax.random.normal(ks[4], (n_blocks, hkv, page, d), jnp.float32)
    # interleaved, per-row-distinct tables; heterogeneous live lengths
    tables = jnp.asarray([[0, 2, 4], [5, 1, 3]], jnp.int32)
    lengths = jnp.asarray([200, 130], jnp.int32)
    causal = jnp.tril(jnp.ones((s_new, s_new), bool))
    bias = jnp.broadcast_to(
        jnp.where(causal, 0.0, -1e30).astype(jnp.float32)[None], (b, s_new, s_new)
    )
    scale = 1.0 / d ** 0.5

    if quant:
        k_pool, k_sc = _quantize_kv(k_pool_f)
        v_pool, v_sc = _quantize_kv(v_pool_f)
        out = paged_flash_decode_attention(
            q, kn, vn, k_pool, v_pool, tables, lengths, bias, scale=scale,
            k_scales=k_sc, v_scales=v_sc, interpret=True,
        )
        k_deq = k_pool.astype(jnp.float32) * k_sc[..., None]
        v_deq = v_pool.astype(jnp.float32) * v_sc[..., None]
    else:
        out = paged_flash_decode_attention(
            q, kn, vn, k_pool_f, v_pool_f, tables, lengths, bias, scale=scale,
            interpret=True,
        )
        k_deq, v_deq = k_pool_f, v_pool_f

    # reference over the gathered contiguous view
    def gather(pool):
        g = pool[tables]  # [B, P, H, page, D]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, p * page, d)

    ref = flash_decode_ref(
        q, kn, vn, gather(k_deq), gather(v_deq), lengths, bias, scale=scale
    )
    # int8 pools run bf16 MXU math in the kernel (cf. test_flash_decode)
    tol = 2e-2 if quant else 2e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=tol, atol=tol)


def test_paged_forward_flash_matches_gather_path(monkeypatch):
    """Full paged Llama forward: kernel path (forced, interpret) == XLA
    gather path, decode and verify-sized blocks."""
    cfg, bundle, params, pcache, _, _ = _mk(quant=True)
    # page=16 is below the kernel's 128 minimum -> rebuild with page 128
    from llmspeculativesampling_tpu.cache.paged import init_paged_cache, set_row_table

    alloc = PageAllocator(num_blocks=8, page=128, max_pages=2)
    pc = init_paged_cache(cfg.num_layers, 8, cfg.num_kv_heads, 128, cfg.head_dim,
                          batch=2, max_pages=2, dtype=cfg.jnp_dtype, quant=True)
    pc = set_row_table(pc, 0, jnp.asarray(alloc.table_row(alloc.alloc(256))), 0)
    pc = set_row_table(pc, 1, jnp.asarray(alloc.table_row(alloc.alloc(256))), 0)

    rng = np.random.default_rng(1)
    prompts = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    step = rng.integers(1, 250, size=(2, 4)).astype(np.int32)

    monkeypatch.setenv("LLMSS_FLASH", "0")
    fwd = lambda p, t, c: bundle.forward(p, cfg, t, c)  # noqa: E731
    _, c1 = jax.jit(fwd)(params, jnp.asarray(prompts), pc)
    ref, _ = jax.jit(fwd)(params, jnp.asarray(step), c1)

    monkeypatch.setenv("LLMSS_FLASH", "1")
    monkeypatch.setenv("LLMSS_FLASH_INTERPRET", "1")
    # fresh trace (env is read at trace time): re-jit with a new wrapper
    _, c2 = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))(
        params, jnp.asarray(prompts), pc
    )
    out, _ = jax.jit(lambda p, t, c, _x: bundle.forward(p, cfg, t, c))(
        params, jnp.asarray(step), c2, 0
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("quant", [False, True])
def test_paged_prefill_matches_incremental(quant):
    """paged_prefill=True (block-only attention + one deferred all-layers
    pool write, serve/paged.py admission path) == the default paged path
    on empty rows: same logits, and the written pool produces the same
    next decode step. Int8 pools tolerate the in-block quantization
    round-trip the gather path applies and prefill (like the flash
    kernel) skips."""
    cfg, bundle, params, _, _, _ = _mk(quant=quant)
    tol = 3e-2 if quant else 2e-4
    from llmspeculativesampling_tpu.cache.paged import init_paged_cache, set_row_table

    def fresh():
        alloc = PageAllocator(num_blocks=8, page=16, max_pages=4)
        pc = init_paged_cache(cfg.num_layers, 8, cfg.num_kv_heads, 16, cfg.head_dim,
                              batch=2, max_pages=4, dtype=cfg.jnp_dtype, quant=quant)
        pc = set_row_table(pc, 0, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
        pc = set_row_table(pc, 1, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
        return pc

    rng = np.random.default_rng(3)
    prompts = jnp.asarray(rng.integers(1, 250, size=(2, 8)).astype(np.int32))
    step = jnp.asarray(rng.integers(1, 250, size=(2, 3)).astype(np.int32))

    ref_logits, c_ref = jax.jit(
        lambda p, t, c: bundle.forward(p, cfg, t, c)
    )(params, prompts, fresh())
    out_logits, c_new = jax.jit(
        lambda p, t, c: bundle.forward(p, cfg, t, c, paged_prefill=True)
    )(params, prompts, fresh())
    np.testing.assert_allclose(
        np.asarray(out_logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=tol, atol=tol,
    )
    # the deferred pool write must feed the next (incremental) step identically
    nxt_ref, _ = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))(
        params, step, c_ref
    )
    nxt_new, _ = jax.jit(lambda p, t, c, _x: bundle.forward(p, cfg, t, c))(
        params, step, c_new, 0
    )
    np.testing.assert_allclose(
        np.asarray(nxt_new, np.float32), np.asarray(nxt_ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_paged_capacity_exceeds_slot_equivalent():
    """The capacity story: with the same pool bytes, paging admits
    mixed-size requests a fixed per-slot allocation cannot."""
    # pool = 32 pages of 16 = 512 positions total
    a = PageAllocator(num_blocks=32, page=16, max_pages=32)
    # slotted equivalent at max_total_len=256: exactly 2 slots.
    # paged: one 256-position request + five 40-position requests coexist
    big = a.alloc(256)
    smalls = [a.alloc(40) for _ in range(5)]
    assert big is not None and all(s is not None for s in smalls)
    assert a.free_blocks == 32 - 16 - 5 * 3


# ------------------------------------------------------------------- OPT

def _mk_opt(quant=False):
    """OPT pair for the paged path (VERDICT round-2 ask #3: the
    opt-125m/opt-13b reference pairing must ride the paged engine)."""
    from llmspeculativesampling_tpu.core.config import OPTConfig
    from llmspeculativesampling_tpu.models import opt

    cfg = OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_layers=2,
        num_heads=4, max_position=256, dtype="float32",
    )
    bundle = ModelBundle("opt", cfg, opt.forward)
    params = opt.init_params(cfg, jax.random.key(1))
    return cfg, bundle, params


@pytest.mark.parametrize("quant", [False, True])
def test_opt_paged_forward_matches_dense_per_row(quant):
    """OPT batched paged decode (heterogeneous per-row lengths, per-row
    rollback) == per-row contiguous-cache runs — the llama paged parity
    test (above) for the second model family."""
    cfg, bundle, params = _mk_opt(quant=quant)
    alloc = PageAllocator(num_blocks=16, page=16, max_pages=8)
    pcache = init_paged_cache(
        cfg.num_layers, 16, cfg.num_kv_heads, 16, cfg.head_dim,
        batch=2, max_pages=8, dtype=cfg.jnp_dtype, quant=quant,
    )
    pcache = set_row_table(pcache, 0, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
    pcache = set_row_table(pcache, 1, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
    fwd = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))
    tol = 3e-2 if quant else 2e-4

    rng = np.random.default_rng(7)
    prompts = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    steps = rng.integers(1, 250, size=(2, 3)).astype(np.int32)

    logits_p, pcache = fwd(params, jnp.asarray(prompts), pcache)
    outs = [np.asarray(logits_p, np.float32)]
    for j in range(3):
        lj, pcache = fwd(params, jnp.asarray(steps[:, j : j + 1]), pcache)
        outs.append(np.asarray(lj, np.float32))
    pcache = rollback_rows(pcache, jnp.asarray([11, 9], jnp.int32))
    redo = rng.integers(1, 250, size=(2, 1)).astype(np.int32)
    l_redo, pcache = fwd(params, jnp.asarray(redo), pcache)
    np.testing.assert_array_equal(np.asarray(pcache.lengths), [12, 10])

    from llmspeculativesampling_tpu.cache.kvcache import init_cache, init_quant_cache
    for r in range(2):
        dcache = (
            init_quant_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim)
            if quant
            else init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, cfg.jnp_dtype)
        )
        ld, dcache = fwd(params, jnp.asarray(prompts[r : r + 1]), dcache)
        np.testing.assert_allclose(np.asarray(ld, np.float32), outs[0][r : r + 1], rtol=tol, atol=tol)
        for j in range(3):
            lj, dcache = fwd(params, jnp.asarray(steps[r : r + 1, j : j + 1]), dcache)
            np.testing.assert_allclose(np.asarray(lj, np.float32), outs[j + 1][r : r + 1], rtol=tol, atol=tol)
        dcache = rollback(dcache, 11 if r == 0 else 9)
        lr, dcache = fwd(params, jnp.asarray(redo[r : r + 1]), dcache)
        np.testing.assert_allclose(
            np.asarray(lr, np.float32), np.asarray(l_redo, np.float32)[r : r + 1],
            rtol=tol, atol=tol,
        )


def test_opt_paged_prefill_matches_incremental():
    """OPT paged_prefill (block-only attention + deferred pool write) ==
    the default paged path on empty rows, including the next step."""
    cfg, bundle, params = _mk_opt()

    def fresh():
        alloc = PageAllocator(num_blocks=8, page=16, max_pages=4)
        pc = init_paged_cache(cfg.num_layers, 8, cfg.num_kv_heads, 16, cfg.head_dim,
                              batch=2, max_pages=4, dtype=cfg.jnp_dtype)
        pc = set_row_table(pc, 0, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
        pc = set_row_table(pc, 1, jnp.asarray(alloc.table_row(alloc.alloc(64))), 0)
        return pc

    rng = np.random.default_rng(9)
    prompts = jnp.asarray(rng.integers(1, 250, size=(2, 8)).astype(np.int32))
    step = jnp.asarray(rng.integers(1, 250, size=(2, 3)).astype(np.int32))

    ref_logits, c_ref = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))(
        params, prompts, fresh())
    out_logits, c_new = jax.jit(
        lambda p, t, c: bundle.forward(p, cfg, t, c, paged_prefill=True)
    )(params, prompts, fresh())
    np.testing.assert_allclose(
        np.asarray(out_logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    nxt_ref, _ = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))(params, step, c_ref)
    nxt_new, _ = jax.jit(lambda p, t, c, _x: bundle.forward(p, cfg, t, c))(params, step, c_new, 0)
    np.testing.assert_allclose(
        np.asarray(nxt_new, np.float32), np.asarray(nxt_ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )
