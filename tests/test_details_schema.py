"""Details-dict schema parity for every engine (VERDICT r1 item #6).

The reference always fills approx_time / target_time / other_time, the
target sub-timers, and per-step acc_len in its ``details`` dicts
(/root/reference/sampling/speculative_sampling.py:2061-2074,
kvcache_model.py:33-36, :560-584). The fused engines fill the phase split
from a one-time compile-warm calibration of the draft loop and verify
forward at the engine's exact shapes (engine/phases.py), flagged
``phase_split_method='calibrated'``; stepwise mode measures directly.
No details field may be None.
"""

import numpy as np
import pytest
import jax

from llmspeculativesampling_tpu.engine.beam_spec import mjsd_generate, multi_beam_generate
from llmspeculativesampling_tpu.engine.beam_tree import (
    beam_speculative_generate,
    beam_speculative_v2_generate,
)
from llmspeculativesampling_tpu.engine.bild import bild_generate
from llmspeculativesampling_tpu.engine.multi import multi_speculative_generate
from llmspeculativesampling_tpu.engine.speculative import speculative_generate
from llmspeculativesampling_tpu.engine.speculative_v2 import speculative_generate_v2

from test_speculative import make_bundle

PROMPT = [3, 14, 15, 9, 26, 5]
EOS = -1

PHASE_KEYS = ("approx_time", "target_time", "other_time",
              "target_model_time", "target_pre_cache_time",
              "target_post_prob_time")


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


def _check(d, steps_key="target_call_times"):
    for k, v in d.items():
        assert v is not None, f"details[{k!r}] is None"
    for k in PHASE_KEYS:
        assert k in d, f"missing phase key {k}"
        assert d[k] >= 0.0
    # split fits inside the wall and the remainder is the 'other' bucket
    assert d["approx_time"] + d["target_time"] <= d["total_time"] + 1e-6
    assert abs(d["approx_time"] + d["target_time"] + d["other_time"]
               - d["total_time"]) < 1e-6
    assert isinstance(d["acc_len"], list)
    assert len(d["acc_len"]) == d[steps_key]


def test_speculative_fused_details(models):
    bd, pd, bt, pt = models
    _, d = speculative_generate(bd, pd, bt, pt, PROMPT, 12, gamma=3,
                                eos_token_id=EOS, top_k=10,
                                key=jax.random.key(1), details=True)
    _check(d)
    assert d["phase_split_method"] == "calibrated"
    assert sum(d["acc_len"]) == d["accepted_count"]


def test_speculative_stepwise_details(models):
    bd, pd, bt, pt = models
    _, d = speculative_generate(bd, pd, bt, pt, PROMPT, 12, gamma=3,
                                eos_token_id=EOS, top_k=10, stepwise=True,
                                key=jax.random.key(1), details=True)
    _check(d)
    assert d["phase_split_method"] == "measured"


def test_speculative_v2_details(models):
    bd, pd, bt, pt = models
    _, d = speculative_generate_v2(bd, pd, bt, pt, PROMPT, 12, gamma=3,
                                   eos_token_id=EOS, top_k=10,
                                   key=jax.random.key(2), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]
    assert 0.0 <= d["acc_rate"] <= 1.0


def test_multi_details(models):
    bd, pd, bt, pt = models
    _, d = multi_speculative_generate(bd, pd, bt, pt, PROMPT, 12, gamma=3,
                                      width=3, eos_token_id=EOS, top_k=10,
                                      key=jax.random.key(3), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]


def test_multi_beam_details(models):
    bd, pd, bt, pt = models
    _, d = multi_beam_generate(bd, pd, bt, pt, PROMPT, 12, gamma=3, width=3,
                               num_beams=4, eos_token_id=EOS, top_k=10,
                               key=jax.random.key(4), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]


def test_mjsd_details(models):
    bd, pd, bt, pt = models
    _, d = mjsd_generate(bd, pd, bt, pt, PROMPT, 12, gamma=3, width=3,
                         num_beams=3, accept_thres=0.1, eos_token_id=EOS,
                         top_k=10, key=jax.random.key(5), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]


def test_bild_details(models):
    bd, pd, bt, pt = models
    _, d = bild_generate(bd, pd, bt, pt, PROMPT, 12, gamma=4,
                         eos_token_id=EOS, top_k=10, key=jax.random.key(6),
                         details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]


def test_beam_v1_details(models):
    bd, pd, bt, pt = models
    _, d = beam_speculative_generate(bd, pd, bt, pt, PROMPT, 10, gamma=2,
                                     num_beams=2, eos_token_id=EOS, top_k=10,
                                     key=jax.random.key(7), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]
    assert d["expect_cnt_list"] == []  # v1 has no DP width


def test_beam_v2_details(models):
    bd, pd, bt, pt = models
    _, d = beam_speculative_v2_generate(bd, pd, bt, pt, PROMPT, 10, gamma=2,
                                        num_beams=2, expect_thres=0.7,
                                        eos_token_id=EOS, top_k=10,
                                        key=jax.random.key(8), details=True)
    _check(d)
    assert sum(d["acc_len"]) == d["accepted_count"]
    # v2 records per-level expect counts while active (reference
    # expect_cnt_list, evaluation.py:889); at least one per step
    assert len(d["expect_cnt_list"]) >= d["target_call_times"]
    assert all(c >= 1 for c in d["expect_cnt_list"])
