"""Algorithm-level tests: speculative_v2, BiLD, multi-candidate (iid).

Each algorithm is checked against behavioral invariants derived from the
reference semantics (file:line cites in each engine module).
"""

import numpy as np
import pytest
import jax

from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
from llmspeculativesampling_tpu.engine.bild import bild_generate
from llmspeculativesampling_tpu.engine.multi import multi_speculative_generate
from llmspeculativesampling_tpu.engine.speculative import speculative_generate
from llmspeculativesampling_tpu.engine.speculative_v2 import speculative_generate_v2

from test_speculative import make_bundle, PROMPT, EOS


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


# ---------------------------------------------------------------- spec v2
def test_v2_greedy_equals_ar(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    v2 = speculative_generate_v2(
        bd, pd, bt, pt, PROMPT, 16, gamma=3, eos_token_id=EOS, top_k=1, key=jax.random.key(1)
    )
    np.testing.assert_array_equal(v2[: len(ar)], ar)


def test_v2_identical_models_full_accept(models):
    _, _, bt, pt = models
    out, d = speculative_generate_v2(
        bt, pt, bt, pt, PROMPT, 12, gamma=3, eos_token_id=EOS,
        top_k=10, key=jax.random.key(2), details=True,
    )
    assert d["accepted_count"] == 3 * d["target_call_times"]


# ------------------------------------------------------------------- BiLD
def test_bild_always_fallback_equals_target_ar(models):
    """fallback_thres=1.0 forces a target check every step; rollback_thres=0
    rejects every small-model token => output is exactly target greedy."""
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 12, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = bild_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=5, fallback_thres=1.1, rollback_thres=0.0,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_bild_never_rollback_keeps_small_tokens(models):
    """rollback_thres huge => all unchecked tokens accepted; the small model
    drives generation with a target sample every gamma tokens."""
    bd, pd, bt, pt = models
    small_ar = autoregressive_generate(bd, pd, PROMPT, 12, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out, d = bild_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=4, fallback_thres=0.0, rollback_thres=1e9,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1), details=True,
    )
    # first gamma-1 generated tokens must match the small model's greedy run
    np.testing.assert_array_equal(out[len(PROMPT): len(PROMPT) + 3], small_ar[len(PROMPT): len(PROMPT) + 3])
    assert d["target_call_times"] < d["approx_call_times"]


def test_bild_details(models):
    bd, pd, bt, pt = models
    out, d = bild_generate(
        bd, pd, bt, pt, PROMPT, 10, gamma=3, fallback_thres=0.8, rollback_thres=3.0,
        eos_token_id=EOS, top_k=10, key=jax.random.key(2), details=True,
    )
    assert d["tokens_generated"] >= 1
    assert d["approx_call_times"] >= d["target_call_times"]


# ---------------------------------------------------- multi-candidate iid
def test_multi_greedy_equals_ar(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    for width in (1, 4):
        out = multi_speculative_generate(
            bd, pd, bt, pt, PROMPT, 16, gamma=3, width=width,
            eos_token_id=EOS, top_k=1, key=jax.random.key(1),
        )
        np.testing.assert_array_equal(out[: len(ar)], ar)


def test_multi_identical_models_full_accept(models):
    _, _, bt, pt = models
    out, d = multi_speculative_generate(
        bt, pt, bt, pt, PROMPT, 12, gamma=3, width=3,
        eos_token_id=EOS, top_k=10, key=jax.random.key(2), details=True,
    )
    assert d["accepted_count"] == 3 * d["target_call_times"]
    assert d["acc_rate"] > 0.99


def test_multi_width_beats_or_matches_single(models):
    """More candidates can only help the expected accepted length; check the
    aggregate over seeds moves the right way (weak statistical check)."""
    bd, pd, bt, pt = models
    acc1, acc4 = [], []
    for s in range(5):
        _, d1 = multi_speculative_generate(
            bd, pd, bt, pt, PROMPT, 16, gamma=3, width=1,
            eos_token_id=EOS, top_k=8, key=jax.random.key(100 + s), details=True)
        _, d4 = multi_speculative_generate(
            bd, pd, bt, pt, PROMPT, 16, gamma=3, width=4,
            eos_token_id=EOS, top_k=8, key=jax.random.key(200 + s), details=True)
        acc1.append(d1["accepted_count"] / d1["target_call_times"])
        acc4.append(d4["accepted_count"] / d4["target_call_times"])
    assert np.mean(acc4) >= np.mean(acc1) - 0.3


def test_multi_diverse_raises(models):
    bd, pd, bt, pt = models
    with pytest.raises(NotImplementedError):
        multi_speculative_generate(
            bd, pd, bt, pt, PROMPT, 4, strategy="diverse", eos_token_id=EOS
        )
