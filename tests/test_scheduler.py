"""Continuous-batching scheduler tests (M7): slot admission, batched SPMD
decode, slot reuse, per-request details, and the int8-cache variant — all on
the virtual CPU backend. The reference has nothing comparable (its server is
blocking batch-1, /root/reference/serving.py:15-61)."""

import numpy as np
import jax

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.serve.scheduler import ContinuousBatchingEngine


def _make_pair(kv_quant=False, num_layers=2, vocab=128):
    cfg_t = LlamaConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_layers=num_layers, num_heads=4, num_kv_heads=4, max_position=512,
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
    kw.setdefault("num_slots", 3)
    kw.setdefault("max_total_len", 256)
    kw.setdefault("max_new_cap", 64)
    kw.setdefault("gamma", 3)
    kw.setdefault("eos_token_id", -1)  # random weights: no natural EOS
    kw.setdefault("top_k", 10)
    kw.setdefault("top_p", 0.9)
    return ContinuousBatchingEngine(bd, pd, bt, pt, **kw)


def test_single_request_completes_with_budget():
    eng = _engine()
    rid = eng.submit(list(range(5, 25)), max_new_tokens=16)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None
    gen = len(c.output_ids) - c.prompt_len
    # commits 1..gamma+1 tokens per step -> may overshoot by < gamma+1
    assert 16 <= gen <= 16 + eng.gamma
    assert (c.output_ids >= 0).all() and (c.output_ids < 128).all()
    assert c.details["target_call_times"] >= 4
    assert sum(c.details["acc_len"]) == c.details["accepted_count"]
    assert 0.0 <= c.details["acc_rate"] <= 1.0


def test_many_requests_reuse_slots():
    eng = _engine(num_slots=2)
    rng = np.random.default_rng(0)
    rids = [
        eng.submit(rng.integers(2, 120, size=rng.integers(4, 30)).tolist(),
                   max_new_tokens=int(n))
        for n in (8, 12, 5, 9, 7)
    ]
    eng.run_until_idle()
    assert eng.num_active == 0 and not eng._pending
    for rid, want in zip(rids, (8, 12, 5, 9, 7)):
        c = eng.result(rid)
        assert c is not None
        gen = len(c.output_ids) - c.prompt_len
        assert want <= gen <= want + eng.gamma


def test_staggered_admission_mid_flight():
    eng = _engine(num_slots=2)
    r1 = eng.submit(list(range(3, 23)), max_new_tokens=20)
    eng.step()  # r1 in flight
    r2 = eng.submit(list(range(40, 52)), max_new_tokens=6)
    eng.run_until_idle()
    c1, c2 = eng.result(r1), eng.result(r2)
    assert c1 is not None and c2 is not None
    assert np.array_equal(c1.output_ids[:20], np.arange(3, 23))
    assert np.array_equal(c2.output_ids[:12], np.arange(40, 52))


def test_quantized_kv_target_scheduler():
    eng = _engine(kv_quant=True)
    rid = eng.submit(list(range(10, 30)), max_new_tokens=10)
    eng.run_until_idle()
    c = eng.result(rid)
    assert c is not None
    gen = len(c.output_ids) - c.prompt_len
    assert 10 <= gen <= 10 + eng.gamma


def test_eos_stops_generation():
    # force EOS: make every token's argmax... instead use eos that the
    # random model will hit: pick the most frequent sampled token as EOS by
    # first running without EOS, then rerun with that token as EOS and
    # check truncation.
    eng = _engine()
    rid = eng.submit(list(range(5, 25)), max_new_tokens=32)
    eng.run_until_idle()
    c = eng.result(rid)
    gen = c.output_ids[c.prompt_len:]
    eos = int(np.bincount(gen).argmax())

    eng2 = _engine(eos_token_id=eos)
    rid2 = eng2.submit(list(range(5, 25)), max_new_tokens=32)
    eng2.run_until_idle()
    c2 = eng2.result(rid2)
    gen2 = c2.output_ids[c2.prompt_len:]
    hits = np.nonzero(gen2 == eos)[0]
    if hits.size:  # EOS sampled -> must be the final token
        assert hits[0] == len(gen2) - 1


def test_validation_errors():
    eng = _engine(max_total_len=64)
    try:
        eng.submit([1], max_new_tokens=4)
        assert False, "short prompt accepted"
    except ValueError:
        pass
    try:
        eng.submit(list(range(2, 60)), max_new_tokens=64)
        assert False, "overlong request accepted"
    except ValueError:
        pass


def test_chunked_sync_outputs_match_per_step_sync():
    """steps_per_sync must not change results: a finished lane freezes
    mid-chunk (keep gate), so chunked and per-step scheduling commit the
    same tokens for the same seeds."""
    outs = {}
    for sps in (1, 3):
        eng = _engine(steps_per_sync=sps, seed=7)
        rids = [eng.submit(list(range(5, 25)), max_new_tokens=9),
                eng.submit(list(range(30, 55)), max_new_tokens=14)]
        eng.run_until_idle()
        outs[sps] = [eng.result(r).output_ids for r in rids]
    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)


def test_multihost_driver_single_process_lockstep():
    """MultiHostDriver runs the same admissions/decode path (broadcast is
    a no-op at process_count==1) and completes requests like the engine."""
    from llmspeculativesampling_tpu.serve.multihost import MultiHostDriver

    eng = _engine(num_slots=2, seed=3)
    drv = MultiHostDriver(eng, prompt_cap=64)
    rids = [drv.submit(list(range(5, 25)), max_new_tokens=7),
            drv.submit(list(range(30, 50)), max_new_tokens=5),
            drv.submit(list(range(60, 75)), max_new_tokens=6)]
    drv.run_until_idle()
    for rid, want in zip(rids, (7, 5, 6)):
        c = drv.result(rid)
        assert c is not None
        gen = len(c.output_ids) - c.prompt_len
        assert want <= gen <= want + eng.gamma


def test_scheduler_flash_attention_path(monkeypatch):
    """The batched (vmapped-over-slots) decode step must run with the
    Pallas flash-decode kernel engaged — the custom_vmap rule collapses the
    slot axis into the kernel's batch grid (kernels/flash_decode.py). Runs
    in interpret mode on CPU; asserts the engine drains and is
    deterministic across identical runs."""
    monkeypatch.setenv("LLMSS_FLASH_INTERPRET", "1")

    def build(flash):
        cfg_t = LlamaConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=2, num_kv_heads=2, max_position=512,
            dtype="float32", flash=flash,
        )
        cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
        pt = llama.init_params(cfg_t, jax.random.key(0))
        pd = {
            "embed": pt["embed"], "ln_final": pt["ln_final"],
            "lm_head": pt["lm_head"],
            "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
        }
        bt = ModelBundle("llama", cfg_t, llama.forward)
        bd = ModelBundle("llama", cfg_d, llama.forward)
        return ContinuousBatchingEngine(
            bd, pd, bt, pt, num_slots=2, max_total_len=256, max_new_cap=32,
            gamma=3, eos_token_id=-1, top_k=10, top_p=0.9, seed=7,
        )

    def run(flash):
        eng = build(flash)
        rids = [eng.submit(list(range(5, 5 + n)), max_new_tokens=8)
                for n in (12, 20, 16)]
        eng.run_until_idle()
        return [eng.result(r).output_ids for r in rids]

    out_a = run("on")
    out_b = run("on")
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(a, b)
    # integrity: budget respected (±gamma overshoot), tokens in-vocab
    for ids, n in zip(out_a, (12, 20, 16)):
        gen = len(ids) - n
        assert 8 <= gen <= 8 + 3 + 1
        assert (ids >= 0).all() and (ids < 128).all()


def test_batched_prefill_matches_sequential_admission():
    """_prefill_batch (one dispatch for a burst of admissions) must leave
    the engine in a state that generates exactly what per-slot sequential
    prefill produced — same seeds, same outputs. Also covers the padded
    (non-power-of-two burst) path via 3 requests -> K=4 with one
    OOB-dropped row."""
    def build():
        cfg_t = LlamaConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=2, num_kv_heads=2, max_position=512,
            dtype="float32",
        )
        cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
        pt = llama.init_params(cfg_t, jax.random.key(0))
        pd = {
            "embed": pt["embed"], "ln_final": pt["ln_final"],
            "lm_head": pt["lm_head"],
            "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
        }
        return ContinuousBatchingEngine(
            ModelBundle("llama", cfg_d, llama.forward), pd,
            ModelBundle("llama", cfg_t, llama.forward), pt,
            num_slots=4, max_total_len=256, max_new_cap=16,
            gamma=3, eos_token_id=-1, top_k=10, top_p=0.9, seed=11,
        )

    prompts = [list(range(5, 5 + n)) for n in (12, 20, 16)]

    # burst: all 3 submitted before stepping -> one batched prefill (K=4)
    eng_a = build()
    rids_a = [eng_a.submit(p, max_new_tokens=8) for p in prompts]
    eng_a.run_until_idle()
    outs_a = [eng_a.result(r).output_ids for r in rids_a]

    # trickle: one at a time, stepping in between -> per-slot prefill
    eng_b = build()
    rids_b = []
    for p in prompts:
        rids_b.append(eng_b.submit(p, max_new_tokens=8))
        eng_b.step()
    eng_b.run_until_idle()
    outs_b = [eng_b.result(r).output_ids for r in rids_b]

    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(a, b)
