"""Tree-attention beam speculative decoding tests (v1 + v2 flagship).

Greedy oracles + structural invariants. Key guarantees checked:
  * ancestor-matrix correctness against a Python reimplementation,
  * greedy collapse: both engines reproduce target greedy decode,
  * identical-models full acceptance for v2,
  * the committed-path cache rebuild is consistent (multi-step greedy runs
    would diverge from the oracle if any k/v position were stale).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
from llmspeculativesampling_tpu.engine.beam_tree import (
    ancestor_matrix,
    beam_speculative_generate,
    beam_speculative_v2_generate,
)

from test_speculative import make_bundle, PROMPT, EOS


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


def test_ancestor_matrix_against_python():
    gamma, b = 3, 4
    rng = np.random.default_rng(0)
    parents = rng.integers(0, b, size=(gamma, b)).astype(np.int32)
    anc = np.asarray(ancestor_matrix(jnp.asarray(parents), gamma, b))

    def ancestors(s, beam):
        out = {s * b + beam}
        cur = beam
        for lvl in range(s, 0, -1):
            cur = parents[lvl][cur]
            out.add((lvl - 1) * b + cur)
        return out

    for s in range(gamma):
        for beam in range(b):
            expect = ancestors(s, beam)
            got = set(np.nonzero(anc[s * b + beam])[0].tolist())
            assert got == expect, (s, beam)


def test_v2_greedy_equals_ar(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    for extra in (1, 2):
        out = beam_speculative_v2_generate(
            bd, pd, bt, pt, PROMPT, 16, gamma=3, num_beams=4,
            extra_sample_cnt=extra, expect_thres=0.7, min_num_beams=1,
            eos_token_id=EOS, top_k=1, key=jax.random.key(1),
        )
        np.testing.assert_array_equal(out[: len(ar)], ar)


def test_v1_greedy_equals_ar_with_identical_models(models):
    """v1's accept test always passes (reference r-1 quirk), so committed
    tokens ARE the draft's: greedy v1 == target greedy only when the draft
    IS the target."""
    _, _, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = beam_speculative_generate(
        bt, pt, bt, pt, PROMPT, 16, gamma=3, num_beams=4, min_num_beams=1,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_v1_commits_draft_tokens(models):
    """With distinct models and greedy decoding, v1 commits the DRAFT's
    greedy path (all drafts accepted by construction)."""
    bd, pd, bt, pt = models
    draft_ar = autoregressive_generate(bd, pd, PROMPT, 8, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = beam_speculative_generate(
        bd, pd, bt, pt, PROMPT, 8, gamma=3, num_beams=4, min_num_beams=1,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(
        out[len(PROMPT): len(PROMPT) + 3], draft_ar[len(PROMPT): len(PROMPT) + 3]
    )


def test_v2_identical_models_accepts(models):
    _, _, bt, pt = models
    out, d = beam_speculative_v2_generate(
        bt, pt, bt, pt, PROMPT, 12, gamma=3, num_beams=4,
        extra_sample_cnt=1, expect_thres=0.5, min_num_beams=1,
        eos_token_id=EOS, top_k=10, key=jax.random.key(2), details=True,
    )
    # with p == q the DP should allow wide acceptance most steps
    assert d["accepted_count"] >= d["target_call_times"]
    assert d["tokens_generated"] >= 4


def test_v1_always_accepts_by_construction(models):
    """Reference r-1 quirk: every level accepts (acc_rate == 1)."""
    bd, pd, bt, pt = models
    out, d = beam_speculative_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=3, num_beams=4,
        eos_token_id=EOS, top_k=10, key=jax.random.key(3), details=True,
    )
    assert d["acc_rate"] > 0.999
    assert d["accepted_count"] == 3 * d["target_call_times"]


def test_v2_sampled_run_produces_tokens(models):
    bd, pd, bt, pt = models
    out, d = beam_speculative_v2_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=3, num_beams=4,
        extra_sample_cnt=2, expect_thres=0.7, min_num_beams=1,
        eos_token_id=EOS, top_k=10, top_p=0.9, key=jax.random.key(4), details=True,
    )
    np.testing.assert_array_equal(out[: len(PROMPT)], PROMPT)
    assert d["tokens_generated"] >= 1
    assert 0.0 <= d["acc_rate"] <= 1.0
