"""Paged continuous-batching engine (serve/paged.py): correctness of the
batch-level speculative step over the shared block pool, byte-accurate
admission control, page recycling, int8 pool variant, and determinism
(burst vs trickle arrival).

Counterpart of tests/test_scheduler.py for the slotted engine; the
reference has no serving concurrency at all (serving.py:15-61)."""

import numpy as np
import pytest
import jax

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.serve.paged import PagedEngine


def _make_pair(kv_quant=False, num_layers=2, vocab=128):
    cfg_t = LlamaConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_layers=num_layers, num_heads=4, num_kv_heads=4, max_position=2048,
        dtype="float32",
    )
    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = llama.init_params(cfg_t, jax.random.key(0))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"], "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    bt = ModelBundle("llama", cfg_t, llama.forward, kv_quant=kv_quant)
    bd = ModelBundle("llama", cfg_d, llama.forward)
    return bd, pd, bt, pt


def _engine(kv_quant=False, **kw):
    bd, pd, bt, pt = _make_pair(kv_quant=kv_quant)
    kw.setdefault("batch_rows", 3)
    kw.setdefault("num_blocks", 24)
    kw.setdefault("page", 32)
    kw.setdefault("max_pages_per_req", 8)
    kw.setdefault("max_new_cap", 64)
    kw.setdefault("gamma", 3)
    kw.setdefault("eos_token_id", -1)  # random weights: no natural EOS
    kw.setdefault("top_k", 10)
    kw.setdefault("top_p", 0.9)
    kw.setdefault("prompt_bucket", 32)
    return PagedEngine(bd, pd, bt, pt, kv_quant=kv_quant, **kw)


def test_single_request_completes():
    eng = _engine()
    rid = eng.submit(list(range(5, 25)), max_new_tokens=16)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None
    gen = len(c.output_ids) - c.prompt_len
    assert 16 <= gen <= 16 + eng.gamma
    assert (c.output_ids >= 0).all() and (c.output_ids < 128).all()
    assert sum(c.details["acc_len"]) == c.details["accepted_count"]
    assert 0.0 <= c.details["acc_rate"] <= 1.0
    # pages were recycled on harvest
    assert eng.allocator.free_blocks == eng.allocator.num_blocks


def test_pool_pressure_queues_and_recycles():
    """More requests than pool pages: admission waits for pages, everyone
    completes, and the pool ends full-free."""
    eng = _engine(batch_rows=3, num_blocks=8, page=32, max_pages_per_req=4)
    rng = np.random.default_rng(0)
    lens = (8, 12, 5, 9, 7, 6)
    rids = [
        eng.submit(rng.integers(2, 120, size=rng.integers(4, 30)).tolist(),
                   max_new_tokens=int(n))
        for n in lens
    ]
    eng.run_until_idle()
    assert eng.num_active == 0 and not eng._pending
    for rid, want in zip(rids, lens):
        c = eng.result(rid)
        assert c is not None
        gen = len(c.output_ids) - c.prompt_len
        assert want <= gen <= want + eng.gamma
    assert eng.allocator.free_blocks == 8


def test_mixed_length_coexistence():
    """A long request and short requests share the pool concurrently —
    the capacity shape a fixed-slot engine cannot express."""
    eng = _engine(batch_rows=4, num_blocks=16, page=32, max_pages_per_req=8)
    long_rid = eng.submit(list(range(2, 2 + 150)), max_new_tokens=40)  # 6 pages
    short = [eng.submit(list(range(3, 13)), max_new_tokens=8) for _ in range(3)]
    eng.step()
    assert eng.num_active >= 3  # long + at least 2 shorts admitted together
    eng.run_until_idle()
    c = eng.result(long_rid)
    assert c is not None and len(c.output_ids) - c.prompt_len >= 40
    for rid in short:
        assert eng.result(rid) is not None


def test_burst_vs_trickle_determinism():
    """Per-request keys are fold_in(admit_key, rid): the same request set
    produces identical outputs whether submitted all at once or one per
    step."""
    r1 = {}
    eng = _engine(seed=7)
    rids = [eng.submit(list(range(5 + i, 20 + i)), max_new_tokens=10) for i in range(4)]
    eng.run_until_idle()
    for i, rid in enumerate(rids):
        r1[i] = eng.result(rid).output_ids

    eng2 = _engine(seed=7)
    rids2 = []
    for i in range(4):
        rids2.append(eng2.submit(list(range(5 + i, 20 + i)), max_new_tokens=10))
        eng2.step()
    eng2.run_until_idle()
    for i, rid in enumerate(rids2):
        np.testing.assert_array_equal(r1[i], eng2.result(rid).output_ids)


def test_release_cadence_invariance():
    """Regression (round-5 find, latent since round 2): a harvested row's
    block table kept pointing at FREED blocks, and the batched step's
    writes for that dead row clobbered whichever newly admitted request
    reused those pages — outputs then depended on the release cadence
    (a tail-idle row overwrote positions inside a live row's pages).
    Dead rows' tables are now gated to the sentinel inside the step;
    outputs must be identical whether requests are released all at once
    or dripped so rows sit idle-but-stale between requests."""
    prompts = [list(range(5 + 7 * i, 15 + 7 * i + (i % 3))) for i in range(6)]

    def run(drip):
        eng = _engine(batch_rows=4, num_blocks=16, page=16,
                      max_pages_per_req=4, max_new_cap=16, gamma=2,
                      steps_per_sync=2, prompt_bucket=16, seed=7)
        rids = []
        if drip:
            import collections

            q = collections.deque(enumerate(prompts))
            while q or eng.num_active or eng._pending:
                # release two requests only when two rows are free: rows
                # go idle-but-stale in between (the clobber window)
                free = sum(r is None for r in eng._row_req)
                while q and free >= 2 and len(eng._pending) < 2:
                    i, p = q.popleft()
                    eng.submit_with_rid(i, np.asarray(p, np.int32), 12)
                    rids.append(i)
                    free -= 1
                eng.step()
        else:
            for i, p in enumerate(prompts):
                eng.submit_with_rid(i, np.asarray(p, np.int32), 12)
                rids.append(i)
            eng.run_until_idle()
        return {r: eng.result(r).output_ids.tolist() for r in rids}

    assert run(False) == run(True)


def test_int8_paged_pool():
    """The quantized paged pool (north-star 'quantized paged KV-cache')
    serves requests end-to-end."""
    eng = _engine(kv_quant=True)
    rids = [eng.submit(list(range(4, 24)), max_new_tokens=8) for _ in range(3)]
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None
        assert len(c.output_ids) - c.prompt_len >= 8


# ---------------------------------------------------------------- prefix cache

def test_shared_allocator_refcount_and_eviction():
    """SharedPageAllocator: chain lookup, refcounted sharing, LRU parking
    on free, and eviction under allocation pressure."""
    from llmspeculativesampling_tpu.cache.paged import (
        SharedPageAllocator, prompt_page_hashes,
    )

    a = SharedPageAllocator(num_blocks=6, page=4, max_pages=6)
    prompt = list(range(10, 10 + 14))  # 14 tokens, page 4 -> 3 shareable
    hashes = prompt_page_hashes(prompt, 4)
    assert len(hashes) == 3  # (14 - 2) // 4

    got = a.alloc_shared(16, hashes)  # 4 pages
    assert got is not None
    blocks1, cached = got
    assert cached == 0 and len(blocks1) == 4
    a.register(hashes, blocks1[:3])

    # identical prompt -> 3-page chain hit, 1 fresh page
    got2 = a.alloc_shared(16, hashes)
    blocks2, cached2 = got2
    assert cached2 == 12 and blocks2[:3] == blocks1[:3]
    assert a.hits == 3

    # diverging prompt -> only the common prefix chain hits
    p3 = list(prompt)
    p3[6] = 99  # mutate page 1 -> chain breaks after page 0
    h3 = prompt_page_hashes(p3, 4)
    got3 = a.alloc_shared(8, h3)
    assert got3 is not None and got3[1] == 4  # one shared page

    # free the first two holders: registered pages PARK, not free
    a.free(blocks1)
    a.free(blocks2)
    assert a.free_blocks < 6 and a.available_blocks > a.free_blocks

    # pressure: allocating more than the free list forces LRU eviction
    a.free(got3[0])
    got4 = a.alloc_shared(24, [])  # 6 pages, needs evictions
    assert got4 is not None and len(got4[0]) == 6
    a.free(got4[0])

    # evicted hashes are gone from the registry
    assert len(a.lookup(hashes)) < 3 or a.available_blocks == 6


def test_prefix_cache_engine_reuses_pages():
    """Second identical-prompt request reports prefix_cached_tokens and
    still decodes correctly; distinct prompts don't cross-hit."""
    eng = _engine(prefix_cache=True, batch_rows=3, num_blocks=24, page=32,
                  max_pages_per_req=8)
    prompt = list(range(5, 5 + 70))  # 70 tokens -> 2 shareable 32-pages
    r1 = eng.submit(prompt, max_new_tokens=8)
    eng.run_until_idle()
    c1 = eng.result(r1)
    assert c1 is not None and c1.details["prefix_cached_tokens"] == 0

    r2 = eng.submit(prompt, max_new_tokens=8)
    eng.run_until_idle()
    c2 = eng.result(r2)
    assert c2 is not None
    assert c2.details["prefix_cached_tokens"] == 64  # 2 pages of 32
    assert len(c2.output_ids) - c2.prompt_len >= 8
    np.testing.assert_array_equal(c2.output_ids[:70], prompt)

    other = eng.submit(list(range(200, 200 + 70)), max_new_tokens=6)
    eng.run_until_idle()
    c3 = eng.result(other)
    assert c3 is not None and c3.details["prefix_cached_tokens"] == 0
    # every page is accounted for (free or parked in the registry)
    assert eng.allocator.available_blocks == 24


def test_prefix_cache_matches_uncached_output():
    """With identical rid->key mapping, a prefix-hit decode must produce
    the same tokens as the uncached engine (same seed, same submissions):
    the shared pages hold bitwise-identical KV, and the suffix KV matches
    within float tolerance, so sampled ids agree on these scales."""
    outs = {}
    for pc in (False, True):
        eng = _engine(prefix_cache=pc, seed=11, batch_rows=2, num_blocks=24,
                      page=32, max_pages_per_req=8)
        prompt = list(range(7, 7 + 70))
        rids = []
        for _ in range(2):  # sequential: second run hits the cache when pc
            rid = eng.submit(prompt, max_new_tokens=10)
            eng.run_until_idle()
            rids.append(rid)
        outs[pc] = [eng.result(r).output_ids for r in rids]
        if pc:
            assert eng.allocator.hits > 0
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


def test_prefix_cache_concurrent_sharing_and_recycle():
    """Several concurrent requests share one hot prefix; pages survive
    harvest in the registry and are reclaimed under pressure."""
    eng = _engine(prefix_cache=True, batch_rows=4, num_blocks=12, page=32,
                  max_pages_per_req=8)
    sys_prompt = list(range(3, 3 + 66))  # 2 shareable pages
    r0 = eng.submit(sys_prompt + [1, 2], max_new_tokens=4)
    eng.run_until_idle()
    assert eng.result(r0) is not None
    rids = [eng.submit(sys_prompt + [50 + i, 60 + i], max_new_tokens=4)
            for i in range(3)]
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None and c.details["prefix_cached_tokens"] == 64
    assert eng.allocator.available_blocks == 12


# ------------------------------------------------------------------- OPT

def _make_opt_pair(kv_quant=False):
    """The reference's second headline pairing (opt-125m draft +
    opt-13b target, README.md:11) shaped down: PagedEngine must serve
    the OPT family end-to-end (VERDICT round-2 ask #3)."""
    from llmspeculativesampling_tpu.core.config import OPTConfig
    from llmspeculativesampling_tpu.models import opt

    cfg_t = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_layers=2,
        num_heads=4, max_position=2048, dtype="float32",
    )
    cfg_d = OPTConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = opt.init_params(cfg_t, jax.random.key(3))
    pd = {
        "embed": pt["embed"], "embed_pos": pt["embed_pos"],
        "ln_final_w": pt["ln_final_w"], "ln_final_b": pt["ln_final_b"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    bt = ModelBundle("opt", cfg_t, opt.forward, kv_quant=kv_quant)
    bd = ModelBundle("opt", cfg_d, opt.forward)
    return bd, pd, bt, pt


def test_opt_paged_engine_completes():
    bd, pd, bt, pt = _make_opt_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=3, num_blocks=24, page=32,
        max_pages_per_req=8, max_new_cap=64, gamma=3, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32,
    )
    rids = [eng.submit(list(range(5, 25)), max_new_tokens=12) for _ in range(3)]
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None
        gen = len(c.output_ids) - c.prompt_len
        assert 12 <= gen <= 12 + eng.gamma
        assert (c.output_ids >= 0).all() and (c.output_ids < 128).all()
        assert sum(c.details["acc_len"]) == c.details["accepted_count"]


def test_opt_paged_engine_int8_pool():
    bd, pd, bt, pt = _make_opt_pair(kv_quant=True)
    eng = PagedEngine(
        bd, pd, bt, pt, kv_quant=True, batch_rows=2, num_blocks=24, page=32,
        max_pages_per_req=8, max_new_cap=64, gamma=3, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32,
    )
    rid = eng.submit(list(range(5, 25)), max_new_tokens=10)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None and len(c.output_ids) - c.prompt_len >= 10


def test_pool_pad_128_matches_native_pool():
    """Pad-to-128 lane rescue (VERDICT r2 ask #6): a D=64-head pair served
    from 128-wide pools must produce BIT-IDENTICAL completions to the
    native-width pools — zero-padded lanes score 0 and the model slices
    the ctx pad back off. (On real chips this moves the sub-128 draft off
    the materializing XLA gather onto the native flash lane.)"""
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.models import llama as L

    cfg_t = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position=2048, dtype="float32",
    )  # head_dim = 64
    assert cfg_t.head_dim == 64
    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = L.init_params(cfg_t, jax.random.key(9))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"], "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    bt = ModelBundle("llama", cfg_t, L.forward)
    bd = ModelBundle("llama", cfg_d, L.forward)
    kw = dict(batch_rows=2, num_blocks=16, page=32, gamma=3, eos_token_id=-1,
              top_k=10, top_p=0.9, prompt_bucket=32, max_pages_per_req=8)
    prompts = [list(range(5, 25)), list(range(40, 55))]

    ref = PagedEngine(bd, pd, bt, pt, pool_pad_128=False, **kw)
    ref_rids = [ref.submit(p, 8) for p in prompts]
    ref.run_until_idle()
    ref_outs = [ref.result(r).output_ids for r in ref_rids]

    eng = PagedEngine(bd, pd, bt, pt, pool_pad_128=True, **kw)
    assert eng.state.draft_cache.k.shape[-1] == 128
    rids = [eng.submit(p, 8) for p in prompts]
    eng.run_until_idle()
    for rid, want in zip(rids, ref_outs):
        np.testing.assert_array_equal(eng.result(rid).output_ids, want)


def test_pool_pad_128_int8():
    """Padded int8 pools: quantization scales computed over the REAL head
    dim before padding, so the round-trip stays exact on the pad."""
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.models import llama as L

    cfg_t = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position=2048, dtype="float32",
    )
    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = L.init_params(cfg_t, jax.random.key(9))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"], "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    bt = ModelBundle("llama", cfg_t, L.forward, kv_quant=True)
    bd = ModelBundle("llama", cfg_d, L.forward)
    eng = PagedEngine(
        bd, pd, bt, pt, kv_quant=True, pool_pad_128=True, batch_rows=2,
        num_blocks=16, page=32, gamma=3, eos_token_id=-1, top_k=10,
        top_p=0.9, prompt_bucket=32, max_pages_per_req=8)
    assert eng.state.target_cache.k_q.shape[-1] == 128
    rid = eng.submit(list(range(5, 25)), 8)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None and c.details["tokens_generated"] >= 8


def test_on_demand_admits_deeper_than_worst_case():
    """VERDICT r4 ask #2: on-demand allocation reserves prompt + runway
    instead of the per-request worst case — a pool that legacy
    reservation can only admit ONE request into runs three concurrently
    on-demand with overcommit=2 (that is where paged attention's
    admission-depth win lives; the default overcommit=1.0 keeps
    admission at sustainable worst-case commitment — measured on chip,
    overcommitting an EOS-less workload thrashes on preemptions)."""
    kw = dict(batch_rows=3, num_blocks=9, page=16, max_pages_per_req=8,
              max_new_cap=64, gamma=3, steps_per_sync=1)
    legacy = _engine(on_demand=False, **kw)
    for _ in range(3):
        legacy.submit(list(range(5, 25)), max_new_tokens=60)
    legacy._admit()
    assert legacy.num_active == 1  # 20+60+3+1 = 84 -> 6 of 9 pages each

    eng = _engine(on_demand=True, overcommit=2.0, **kw)
    rids = [eng.submit(list(range(5, 25)), max_new_tokens=60)
            for _ in range(3)]
    eng._admit()
    assert eng.num_active == 3
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None and c.details["tokens_generated"] >= 60
    assert eng.allocator.free_blocks == 9  # everything recycled


def test_preemption_parity_with_unpreempted_run():
    """Pool exhaustion preempts the youngest row (pages freed, request
    requeued with its committed tokens + evolved PRNG key) and the
    resumed run must replay BIT-IDENTICALLY to a run that never
    preempted. Reference surface being surpassed: serving.py:42-55
    (strictly sequential, no memory management at all)."""
    prompts = [list(range(5 + 7 * i, 25 + 7 * i)) for i in range(3)]

    def run(num_blocks):
        eng = _engine(on_demand=True, overcommit=2.0, batch_rows=3,
                      num_blocks=num_blocks, page=16, max_pages_per_req=8,
                      max_new_cap=64, gamma=3, steps_per_sync=1, seed=3)
        rids = [eng.submit(p, max_new_tokens=56) for p in prompts]
        eng.run_until_idle()
        outs = [eng.result(rid) for rid in rids]
        assert all(c is not None for c in outs)
        return eng, outs

    eng_small, outs_small = run(num_blocks=10)   # 160 positions for ~3x80
    eng_big, outs_big = run(num_blocks=24)       # no pressure
    assert eng_small.preemptions > 0, "pool was meant to force preemption"
    assert eng_big.preemptions == 0
    for cs, cb in zip(outs_small, outs_big):
        assert cs.output_ids.tolist() == cb.output_ids.tolist()
        assert cs.prompt_len == cb.prompt_len
        assert cs.details["tokens_generated"] == cb.details["tokens_generated"]
        # merged counters must cover the whole logical run
        assert cs.details["accepted_count"] == cb.details["accepted_count"]
        assert sum(cs.details["acc_len"]) == cs.details["accepted_count"]
    # preempted pages were recycled
    assert eng_small.allocator.free_blocks == 10


def test_runway_clamps_to_table_width():
    """Regression: the runway overrun margin must clamp to t_max —
    with target_total + chunk_runway > max_pages*page, growth overflowed
    the block-table row and crashed admission at 13B bench configs."""
    eng = _engine(on_demand=True, batch_rows=2, num_blocks=16, page=16,
                  max_pages_per_req=6, max_new_cap=64, gamma=3,
                  steps_per_sync=4)
    # target_total = 20 + 60 = 80; +runway 20 = 100 > t_max 96
    rid = eng.submit(list(range(5, 25)), max_new_tokens=60)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None and c.details["tokens_generated"] >= 60
    assert eng.allocator.free_blocks == 16


def test_chunked_prefill_interleaves_and_matches():
    """VERDICT r4 ask #5 (SARATHI): with chunked_prefill=True a long cold
    prompt's prefill runs as extend-window dispatches interleaved with
    decode chunks — the running row keeps decoding during the admission —
    and every output is identical to the monolithic-prefill engine's."""
    kw = dict(batch_rows=2, num_blocks=24, page=32, max_pages_per_req=8,
              max_new_cap=64, gamma=3, steps_per_sync=1, extend_chunk=16,
              seed=5)

    def run(flag, extra=0):
        eng = _engine(chunked_prefill=flag, prefill_extra=extra, **kw)
        r_short = eng.submit(list(range(5, 25)), max_new_tokens=48)
        eng.step()  # short request admitted and decoding
        r_long = eng.submit(list(range(30, 30 + 120)), max_new_tokens=16)
        eng.run_until_idle()
        return eng, eng.result(r_short), eng.result(r_long)

    def run_extra(extra):
        return run(True, extra)

    e1, s1, l1 = run(True)
    e0, s0, l0 = run(False)
    assert all(c is not None for c in (s1, l1, s0, l0))
    # 120-token cold prompt piggybacking gamma tokens/step: many decode
    # chunks carried the prefilling row
    assert e1.interleaved_chunks >= 3
    assert e0.interleaved_chunks == 0
    assert s1.output_ids.tolist() == s0.output_ids.tolist()
    assert l1.output_ids.tolist() == l0.output_ids.tolist()
    assert e1.allocator.free_blocks == 24

    # prefill_extra widens the verify window (faster piggyback prefill);
    # outputs must stay identical — decode rows' trailing window slots
    # carry junk whose KV is rewritten before the length pointer crosses
    # it and whose distributions are sliced off pre-accept
    e2, s2, l2 = run_extra(8)
    assert s2.output_ids.tolist() == s0.output_ids.tolist()
    assert l2.output_ids.tolist() == l0.output_ids.tolist()
    assert e2.interleaved_chunks < e1.interleaved_chunks  # fewer chunks needed


def test_adaptive_gamma_completes_and_adapts():
    """adaptive_gamma=(2, 4, 8): requests complete correctly and the
    controller lands on a depth consistent with the measured acceptance
    (it must at least produce a valid gamma from the choices and a
    finite acceptance EMA after serving)."""
    bd, pd, bt, pt = _make_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=3, num_blocks=24, page=32,
        max_pages_per_req=8, max_new_cap=64, gamma=4, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32, adaptive_gamma=(2, 4, 8),
    )
    assert eng.gamma == 2  # epoch mode ramps on the shallowest arm
    rids = [eng.submit(list(range(5, 25)), max_new_tokens=24) for _ in range(3)]
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None
        assert len(c.output_ids) - c.prompt_len >= 24
    assert eng.gamma in (2, 4, 8)
    assert eng._acc_ema is not None and 0.0 < eng._acc_ema < 1.0


def test_adaptive_gamma_bandit():
    """CHUNK mode (round 3's bandit, kept as an explicit opt-in): explores
    every arm once, then exploits the arm with the best MEASURED
    committed-tokens/wall, with a periodic runner-up re-probe; the
    acceptance EMA stays a sane estimate."""
    bd, pd, bt, pt = _make_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=2, num_blocks=16, page=32,
        max_pages_per_req=8, max_new_cap=32, gamma=4, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32, adaptive_gamma=(2, 4, 8),
        adaptive_gamma_mode="chunk",
    )
    # exploration: every arm must be visited twice before exploiting
    seen = []
    g = 4
    for _ in range(6):
        eng._update_gamma(acc_delta=20.0, step_delta=10.0, used_gamma=g, wall=1.0)
        seen.append(g)
        g = eng.gamma
    assert all(seen.count(a) >= 2 for a in (2, 4, 8)), seen
    # make gamma=8 measure clearly best; exploitation picks it
    eng._arm_rate.update({2: 10.0, 4: 30.0, 8: 50.0})
    eng._chunk_count = 1  # not a probe step
    eng._update_gamma(acc_delta=30.0, step_delta=10.0, used_gamma=8, wall=1.0)
    assert eng.gamma == 8
    assert 0.0 < eng._acc_ema < 1.0
    # periodic re-probe hits the runner-up
    eng._arm_rate.update({2: 10.0, 4: 30.0, 8: 50.0})
    eng._chunk_count = 7
    eng._update_gamma(acc_delta=30.0, step_delta=10.0, used_gamma=8, wall=1.0)
    assert eng.gamma == 4  # ranked[1]


def test_adaptive_gamma_epoch_controller():
    """EPOCH mode (the round-4 default): arms switch only at epoch
    boundaries, credited with completed-request throughput — the
    granularity at which request-turnover effects are visible (the
    round-3 chunk bandit structurally converged to the 2nd-best arm,
    docs/PERFORMANCE.md). Round-5 warm-start semantics (VERDICT r4 #3):
    the rotated ramp epoch closes as arm-MIXED (credits no arm, yields
    the per-chunk prior instead), exploration follows the DOMINANCE rule
    (arms deeper than the chunk-prior best are dominated and skip their
    up-front epoch; shallower arms — the ones chunk rates structurally
    under-rank — are always epoch-measured), and skipped arms are left
    to the lazy reprobe cycle. Drive the controller's host logic
    directly; chunk feedback must NOT switch the arm."""
    bd, pd, bt, pt = _make_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=4, num_blocks=16, page=32,
        max_pages_per_req=4, max_new_cap=32, gamma=4, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32, adaptive_gamma=(2, 4, 8),
    )
    assert eng._ag_mode == "epoch" and eng.gamma == 2  # shallowest-arm ramp

    # chunk-level feedback updates the prior but never switches the arm
    eng._update_gamma(acc_delta=20.0, step_delta=10.0, used_gamma=4, wall=1.0)
    assert eng.gamma == 2 and 4 in eng._arm_rate

    # chunk prior as the rotated ramp would leave it: 4 is chunk-best;
    # 2 is shallower (always epoch-measured), 8 is deeper (dominated —
    # skips its up-front epoch)
    eng._arm_rate.update({2: 50.0, 4: 60.0, 8: 20.0})

    # simulated epoch throughput per arm: 2 -> 100 tok/s, 4 -> 60, 8 -> 30
    rates = {2: 100.0, 4: 60.0, 8: 30.0, "mixed": 70.0}

    eng._row_req[0] = object()  # engine looks busy -> epochs open

    def run_epoch():
        import time as _t

        # emulate the admission hold having drained + cleared (the real
        # clear happens in _admit when a full wave of rows frees)
        eng._resync = False
        arm = eng.gamma if eng._ep_phase != "ramp" else "mixed"
        eng._ep_start = _t.perf_counter() - 1.0  # opened 1 s ago (the
        # real open happens at first chunk dispatch)
        eng._ep_tokens = int(rates[arm])
        eng._ep_completions = eng._ep_size  # full row turnover
        eng._epoch_tick()
        return arm

    assert run_epoch() == "mixed"      # rotated ramp epoch — NOT credited
    assert eng._ep_rate == {} and eng._ep_history[0]["gamma"] == "mixed"
    assert eng._best_wall_pc == pytest.approx(1.0 / eng._ep_size, rel=1e-2)
    # exploration: dominance-filtered arms, prior order — 4 then 2; the ramp
    # already settled rotation on 4 so the first explore needs no switch
    assert eng.gamma == 4 and eng._ep_phase == "explore"
    assert run_epoch() == 4            # credits 4; next explore arm is 2
    assert eng.gamma == 2 and eng._ep_phase == "explore"
    # the arm switch arms the one-shot admission re-sync; while held,
    # epoch accounting pauses (ADVICE r4: a wall-cap closure mid-drain
    # would charge the old arm's stragglers to the new arm)
    assert eng._resync
    import time as _t

    eng._ep_start = _t.perf_counter() - 100.0
    eng._ep_tokens, eng._ep_completions = 999, eng._ep_size
    before = eng._ep_count
    eng._epoch_tick()
    assert eng._ep_count == before     # paused: no closure during drain
    eng._pending.extend([object()] * 8)
    eng._admit()                       # 1 free row < full wave: held
    assert eng._resync
    eng._pending.clear()
    eng._row_req[0] = None
    eng._admit()                       # all rows free + no pending: clears
    assert not eng._resync
    eng._row_req[0] = object()
    assert run_epoch() == 2            # credits 2 -> exploit the best arm
    assert eng.gamma == 2 and eng._ep_phase == "exploit"
    assert 8 not in eng._ep_rate       # dominated (deeper than chunk-best): no up-front epoch
    for g in (2, 4):
        assert eng._ep_rate[g] == pytest.approx(rates[g], rel=0.2)
    # periodic probe cycles the non-incumbent arms (eventually measuring
    # even the dominance-skipped gamma=8), then returns to the best
    seen = [run_epoch() for _ in range(2 * eng._ep_reprobe_every + 2)]
    assert 4 in seen and 8 in seen
    assert seen.count(2) >= 2 * (eng._ep_reprobe_every - 1)
    assert eng.gamma == 2

    # wall cap: a probe epoch that stalls (few completions, long wall)
    # is closed early with its low partial rate instead of waiting for
    # the full turnover
    import time as _t

    eng.gamma = 8
    eng._ep_phase = "probe"
    eng._ep_start = _t.perf_counter() - 10.0  # way past 1.6x best pace * size
    eng._ep_tokens, eng._ep_completions = 5, 1
    before = eng._ep_count
    eng._epoch_tick()
    assert eng._ep_count == before + 1 and eng._ep_history[-1]["capped"]
    assert eng._ep_rate[8] < rates[8]  # dragged down by the abort
    assert eng.gamma == 2              # back to exploiting

    # idle reset drops the partial epoch but keeps learned rates
    eng._epoch_reset()
    assert eng._ep_start is None and eng._ep_rate[2] > 0
    st = eng.adaptive_stats()
    assert st["mode"] == "epoch" and st["gamma"] == 2 and st["epochs"] >= 5


def test_warmup_leaves_controller_pristine():
    """ADVICE r4 (medium): warmup()'s main prefill/decode waves complete
    real 2-token requests; with the controller reset placed BEFORE them,
    those completions closed real epochs — live traffic then started
    mid-'explore' on a non-ramp arm with warmup-garbage _ep_rate entries.
    The reset must run at the END of warmup."""
    bd, pd, bt, pt = _make_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=3, num_blocks=24, page=32,
        max_pages_per_req=8, max_new_cap=64, gamma=4, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32, adaptive_gamma=(2, 4, 8),
    )
    eng.warmup(prompt_lens=(8,))
    assert eng._ep_phase == "ramp" and eng.gamma == 2
    assert eng._ep_rate == {} and eng._ep_history == []
    assert eng._arm_rate == {} and eng._ramp_chunks == 0
    assert eng._ep_completions == 0 and eng._ep_tokens == 0
    assert not eng._resync and eng._next_rid == 0


def test_adaptive_gamma_epoch_serves_correctly():
    """End-to-end epoch mode on the tiny pair: requests complete with the
    right token counts while the controller cycles arms."""
    bd, pd, bt, pt = _make_pair()
    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=3, num_blocks=24, page=32,
        max_pages_per_req=8, max_new_cap=64, gamma=4, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=32, adaptive_gamma=(2, 4),
    )
    rids = [eng.submit(list(range(5, 25)), max_new_tokens=24)
            for _ in range(9)]
    eng.run_until_idle()
    for rid in rids:
        c = eng.result(rid)
        assert c is not None
        assert len(c.output_ids) - c.prompt_len >= 24
    assert eng.gamma in (2, 4)


def test_dp_admission_skips_full_shard():
    """ADVICE r3 #4: with dp>1, admission must not head-of-line block on
    free_rows[0]'s shard — when shard 0's pool is exhausted but shard 1
    has a free row and pool space, the request goes to shard 1."""
    from llmspeculativesampling_tpu.parallel import make_mesh

    bd, pd, bt, pt = _make_pair()
    mesh = make_mesh(dp=2, tp=4)
    eng = PagedEngine(
        bd, pd, bt, pt, mesh=mesh, batch_rows=4, num_blocks=16, page=32,
        max_pages_per_req=8, max_new_cap=32, gamma=2, eos_token_id=-1,
        top_k=10, top_p=0.9, prompt_bucket=16, steps_per_sync=2,
    )
    assert eng.dp == 2 and len(eng._allocs) == 2
    # Exhaust shard 0's pool out-of-band.
    stolen = eng._allocs[0].alloc(eng._allocs[0].free_blocks * eng.page)
    assert stolen is not None and eng._allocs[0].free_blocks == 0
    rid = eng.submit(list(range(5, 15)), max_new_tokens=6)
    eng._admit()
    # Admitted (not queued), and to a shard-1 row.
    assert not eng._pending
    rows = [i for i, r in enumerate(eng._row_req) if r is not None]
    assert rows and all(r >= eng._rows_local for r in rows), rows
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None and len(c.output_ids) > c.prompt_len
    eng._allocs[0].free(stolen)
    assert eng._allocs[0].free_blocks == eng._allocs[0].num_blocks


def test_staged_prefix_pages_register_only_after_prefill():
    """A piggybacked (staged) admission's prompt pages must NOT enter the
    prefix-cache registry until the whole prompt's target KV has been
    computed — the piggyback writes it gamma tokens per chunk over many
    chunks, so registering at staging would let a same-prefix admission
    alloc_shared() pages holding garbage, and a preemption would park
    never-written pages in the evictable LRU. Also pins the staged-path
    TTFT semantics: prefill_time stays unset until the host observes the
    prefill complete (staging-time stamping read ~0 ms and overstated the
    chunked-prefill TTFT win)."""
    from llmspeculativesampling_tpu.cache.paged import prompt_page_hashes

    kw = dict(batch_rows=2, num_blocks=24, page=32, max_pages_per_req=8,
              max_new_cap=64, gamma=3, steps_per_sync=1, extend_chunk=16,
              seed=5, chunked_prefill=True, prefix_cache=True)
    eng = _engine(**kw)
    r_short = eng.submit(list(range(5, 25)), max_new_tokens=48)
    eng.step()  # short request admitted and decoding
    long_prompt = list(range(30, 30 + 120))
    hashes = prompt_page_hashes(np.asarray(long_prompt, np.int32), eng.page)
    assert len(hashes) >= 3
    r_long = eng.submit(long_prompt, max_new_tokens=16)
    saw_prefilling = False
    for _ in range(300):
        eng.step()
        if eng._n_prefilling() > 0:
            saw_prefilling = True
            reg = eng.allocator._by_hash
            assert not any(h in reg for h in hashes), (
                "staged prompt pages published before their KV existed")
            # TTFT not stamped while the prompt is still being computed
            row = next(i for i, r in enumerate(eng._row_req)
                       if r is not None and r.rid == r_long)
            assert eng._row_req[row].prefill_time is None
        if eng._n_prefilling() == 0 and not eng._pending and saw_prefilling:
            break
    assert saw_prefilling
    eng.run_until_idle()
    s, l = eng.result(r_short), eng.result(r_long)
    assert s is not None and l is not None
    assert l.details["ttft_s"] > 0
    # prefill complete -> pages are now published
    reg = eng.allocator._by_hash
    assert all(h in reg for h in hashes)
    # a same-prefix request must hit the published chain AND match the
    # output a cold engine produces (valid KV in the shared pages)
    r2 = eng.submit(long_prompt, max_new_tokens=16)
    eng.run_until_idle()
    c2 = eng.result(r2)
    assert c2.details["prefix_cached_tokens"] > 0
    cold = _engine(**kw)
    rs = cold.submit(list(range(5, 25)), max_new_tokens=48)
    cold.step()
    rl = cold.submit(long_prompt, max_new_tokens=16)
    cold.run_until_idle()
    cold.result(rs)
    assert c2.output_ids.tolist() == cold.result(rl).output_ids.tolist()


def test_staged_preemption_never_publishes_pages():
    """drain_requests (the failover path) preempts mid-prefill staged
    rows; their pending page publication must be dropped, not parked in
    the registry/evictable LRU with uncomputed KV."""
    from llmspeculativesampling_tpu.cache.paged import prompt_page_hashes

    kw = dict(batch_rows=2, num_blocks=24, page=32, max_pages_per_req=8,
              max_new_cap=64, gamma=3, steps_per_sync=1, extend_chunk=16,
              seed=5, chunked_prefill=True, prefix_cache=True)
    eng = _engine(**kw)
    eng.submit(list(range(5, 25)), max_new_tokens=48)
    eng.step()
    long_prompt = list(range(30, 30 + 120))
    hashes = prompt_page_hashes(np.asarray(long_prompt, np.int32), eng.page)
    eng.submit(long_prompt, max_new_tokens=16)
    for _ in range(3):
        eng.step()
    assert eng._n_prefilling() > 0  # mid-prefill
    eng.drain_requests()
    assert not eng._pending_reg
    assert not any(h in eng.allocator._by_hash for h in hashes)
    assert eng.allocator.free_blocks == eng.allocator.num_blocks


def test_warmup_compiles_piggyback_path():
    """The warmup parked request must survive the staging window (its
    budget exceeds one chunk's worst-case commit) so the long warmup
    prompt deterministically takes the PIGGYBACK path — with max_new=8 it
    could finish inside the single step and the decode-gate then sent the
    long prompt monolithic, leaving the staged programs uncompiled
    (nondeterministic warmup coverage)."""
    eng = _engine(batch_rows=2, num_blocks=24, page=32, max_pages_per_req=8,
                  max_new_cap=64, gamma=3, steps_per_sync=1, extend_chunk=16,
                  chunked_prefill=True)
    eng.warmup()
    assert eng.interleaved_chunks > 0, (
        "warmup never exercised the piggyback admission path")
    assert eng.num_active == 0 and not eng._pending
    # warmup must leave no published pages or stray completions behind
    assert not eng.completions
