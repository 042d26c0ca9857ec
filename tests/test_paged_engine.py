"""Paged continuous-batching engine (serve/paged.py): correctness of the
batch-level speculative step over the shared block pool, byte-accurate
admission control, page recycling, int8 pool variant, and determinism
(burst vs trickle arrival).

Counterpart of tests/test_scheduler.py for the slotted engine; the
reference has no serving concurrency at all (serving.py:15-61)."""

import numpy as np
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
