"""Beam-drafted algorithm tests: beam_draft, multi-beam, MJSD, random-width.

Greedy (top_k=1) collapses every beam construct to the deterministic
argmax path, giving exact token-for-token oracles against the AR engine.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
from llmspeculativesampling_tpu.engine.beam_draft import beam_draft, top_width
from llmspeculativesampling_tpu.engine.beam_spec import mjsd_generate, multi_beam_generate
from llmspeculativesampling_tpu.engine.multi import multi_speculative_generate
from llmspeculativesampling_tpu.engine.random_beam import random_width_beam_generate
from llmspeculativesampling_tpu.engine.types import pad_prompt
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig

from test_speculative import make_bundle, PROMPT, EOS


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


def test_beam_draft_single_beam_greedy_equals_ar(models):
    bd, pd, *_ = models
    ar = autoregressive_generate(bd, pd, PROMPT, 4, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    prompt_padded, p_len = pad_prompt(PROMPT)
    tokens = jnp.zeros((1, 96), jnp.int32)
    tokens = tokens.at[:, :prompt_padded.shape[1]].set(jnp.asarray(prompt_padded))
    cache = bd.make_cache(1, 96)
    _, cache = bd.forward(pd, bd.cfg, jnp.asarray(prompt_padded), cache)
    res = beam_draft(
        bd, pd, SamplingConfig(1.0, 1, 0.0), 4, 1,
        jnp.broadcast_to(tokens, (1, 96)), jnp.asarray(p_len, jnp.int32),
        cache, jax.random.key(1),
    )
    np.testing.assert_array_equal(np.asarray(res.tail[0]), ar[p_len : p_len + 4])
    # root/path bookkeeping trivially consistent at width 1
    assert int(res.root[0]) == 0
    assert np.all(np.asarray(res.step_beam_idx) == 0)


def test_beam_draft_path_consistency(models):
    """Every final beam's tail must be reachable through step_beam_idx /
    step_next_tok parent pointers (path bookkeeping invariant)."""
    bd, pd, *_ = models
    prompt_padded, p_len = pad_prompt(PROMPT)
    tokens = jnp.zeros((4, 96), jnp.int32)
    tokens = tokens.at[:, :prompt_padded.shape[1]].set(jnp.asarray(prompt_padded))
    cache = bd.make_cache(4, 96)
    _, cache = bd.forward(pd, bd.cfg, jnp.broadcast_to(jnp.asarray(prompt_padded), (4, prompt_padded.shape[1])), cache)
    gamma, nb = 3, 4
    res = beam_draft(
        bd, pd, SamplingConfig(1.0, 8, 0.0), gamma, nb, tokens,
        jnp.asarray(p_len, jnp.int32), cache, jax.random.key(2),
    )
    beam_idx = np.asarray(res.step_beam_idx)  # [gamma, nb]
    next_tok = np.asarray(res.step_next_tok)
    tail = np.asarray(res.tail)
    for b in range(nb):
        # walk backwards from final beam b
        path = []
        cur = b
        for s in range(gamma - 1, -1, -1):
            path.append(next_tok[s, cur])
            cur = beam_idx[s, cur]
        np.testing.assert_array_equal(tail[b], path[::-1])


def test_multi_beam_greedy_equals_ar(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = multi_beam_generate(
        bd, pd, bt, pt, PROMPT, 16, gamma=3, width=2, num_beams=4,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_multi_strategy_beam_dispatch(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 8, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = multi_speculative_generate(
        bd, pd, bt, pt, PROMPT, 8, gamma=3, width=2, strategy="beam",
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_mjsd_greedy_equals_ar(models):
    bd, pd, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 16, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = mjsd_generate(
        bd, pd, bt, pt, PROMPT, 16, gamma=3, width=2, num_beams=4,
        accept_thres=0.1, eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_mjsd_thres_zero_accepts_all(models):
    bd, pd, bt, pt = models
    out, d = mjsd_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=3, width=2, num_beams=4,
        accept_thres=0.0, eos_token_id=EOS, top_k=8, key=jax.random.key(2), details=True,
    )
    assert d["accepted_count"] == 3 * d["target_call_times"]


def test_mjsd_thres_above_one_rejects_all(models):
    bd, pd, bt, pt = models
    out, d = mjsd_generate(
        bd, pd, bt, pt, PROMPT, 8, gamma=3, width=2, num_beams=4,
        accept_thres=1.5, eos_token_id=EOS, top_k=8, key=jax.random.key(3), details=True,
    )
    assert d["accepted_count"] == 0
    assert d["tokens_generated"] >= 1  # degrades to target-only sampling


def test_random_beam_single_width_greedy_equals_ar(models):
    _, _, bt, pt = models
    ar = autoregressive_generate(bt, pt, PROMPT, 12, eos_token_id=EOS, top_k=1, key=jax.random.key(0))
    out = random_width_beam_generate(
        bt, pt, PROMPT, 12, max_num_beams=1, min_num_beams=1,
        eos_token_id=EOS, top_k=1, key=jax.random.key(1),
    )
    np.testing.assert_array_equal(out[: len(ar)], ar)


def test_random_beam_multi_width_runs(models):
    _, _, bt, pt = models
    out = random_width_beam_generate(
        bt, pt, PROMPT, 12, max_num_beams=4, min_num_beams=2,
        eos_token_id=EOS, top_k=8, key=jax.random.key(2),
    )
    np.testing.assert_array_equal(out[: len(PROMPT)], PROMPT)
    assert len(PROMPT) < len(out) <= len(PROMPT) + 13
