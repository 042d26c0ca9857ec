"""Distribution parity for every verify-based engine (VERDICT r1 item #2).

The round-1 suite proved the exact-distribution property only for the base
``speculative_generate``. Here every other verify-based engine gets a
seeded many-draw first-token histogram test against the distribution its
*reference semantics* imply (SURVEY.md §4 implication (b)):

  * multi (iid):  NOT exactly distribution-preserving (longest-accepted
    candidate selection) — tested against a NumPy oracle of the reference's
    accept rule (speculative_sampling.py:1612-1640) at gamma=1.
  * mjsd: deterministic-threshold rule, not distribution-preserving by
    design (:1277-1310) — NumPy oracle of that rule at gamma=width=1.
  * beam v2 (flagship): with num_beams=1 the dynamic-width walk must
    REDUCE to plain speculative sampling — first token exactly
    target-distributed. A wrong residual walk (beam_tree.py _v2_walk) or
    biased resample breaks this reduction.
  * beam v1: the always-accept rescore (r-1 quirk, :845-847) makes the
    committed level-0 token exactly DRAFT-distributed at num_beams=1 —
    that quirk is the reference's semantics and is what we test.
  * random_beam: with max_num_beams=min_num_beams=1 it must reduce to
    plain target sampling.

All tests use temperature=1 + top_k (no top_p) so the draft's joint warp
(which excludes temperature, kvcache_model.py:494-499) coincides with the
engine warp and double-warping is idempotent.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.engine.beam_spec import _beam_spec_device
from llmspeculativesampling_tpu.engine.beam_tree import _beam_tree_device
from llmspeculativesampling_tpu.engine.multi import _multi_device
from llmspeculativesampling_tpu.engine.random_beam import _random_beam_device
from llmspeculativesampling_tpu.engine.types import pad_prompt
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, norm_logits

from test_speculative import make_bundle

PROMPT = [3, 14, 15, 9, 26, 5]
EOS = -1
TOPK = 8
N = 20000
TV_TOL = 0.035


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


@pytest.fixture(scope="module")
def dists(models):
    """Warped first-position draft (q) and target (p) distributions."""
    bd, pd, bt, pt = models
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)
    ql, _ = bd.forward(pd, bd.cfg, jnp.asarray(prompt_padded), bd.make_cache(1, 64))
    pl, _ = bt.forward(pt, bt.cfg, jnp.asarray(prompt_padded), bt.make_cache(1, 64))
    q = np.asarray(norm_logits(ql[:, p_len - 1], scfg))[0]
    p = np.asarray(norm_logits(pl[:, p_len - 1], scfg))[0]
    return q, p


def _tv(hist_draws, ref_probs, vocab):
    hist = np.bincount(np.asarray(hist_draws), minlength=vocab) / len(hist_draws)
    return 0.5 * np.abs(hist - ref_probs).sum()


def _max_fn(x):
    r = np.maximum(x, 0.0)
    return r / max(r.sum(), 1e-20)


# ------------------------------------------------------------------ multi iid
def test_multi_iid_first_token_matches_reference_oracle(models, dists):
    bd, pd, bt, pt = models
    q, p = dists
    vocab = bt.cfg.vocab_size
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)
    width = 3

    def one_run(key):
        out = _multi_device(
            pd, pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32),
            key, None,
            bundle_d=bd, bundle_t=bt, gamma=1, width=width, max_new_tokens=1,
            scfg=scfg, eos_token_id=EOS, max_total_len=prompt_padded.shape[1] + 4,
        )
        return out[0][0, p_len]

    keys = jax.random.split(jax.random.key(7), N)
    draws = np.asarray(jax.vmap(one_run)(keys))

    # NumPy oracle of the reference rule (:1612-1674) at gamma=1
    rng = np.random.default_rng(0)
    support = np.flatnonzero(q)
    resid = _max_fn(p - q)
    if resid.sum() < 1e-6:
        resid = p
    oracle = np.empty(N, np.int64)
    xs = rng.choice(vocab, size=(N, width), p=q)
    rs = rng.uniform(size=(N, width))
    ratio = np.minimum(p[xs] / q[xs], 1.0)
    acc = rs < ratio
    any_acc = acc.any(axis=1)
    choice = np.argmax(acc, axis=1)  # first accepted (or 0)
    oracle[any_acc] = xs[any_acc, choice[any_acc]]
    n_rej = int((~any_acc).sum())
    oracle[~any_acc] = rng.choice(vocab, size=n_rej, p=resid)

    hist_o = np.bincount(oracle, minlength=vocab) / N
    tv = _tv(draws, hist_o, vocab)
    assert tv < TV_TOL, f"multi iid vs oracle TV {tv:.4f}"
    assert set(np.unique(draws)) <= set(support) | set(np.flatnonzero(resid))


# ---------------------------------------------------------------------- mjsd
def test_mjsd_first_token_matches_reference_rule(models, dists):
    """mjsd at width=num_beams=gamma=1: accept iff accept_thres <=
    min(1, p(x)/q(x)); else sample max_fn(p) (:1288-1332)."""
    bd, pd, bt, pt = models
    q, p = dists
    vocab = bt.cfg.vocab_size
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)
    thres = 0.5

    def one_run(key):
        out = _beam_spec_device(
            pd, pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32),
            key, None,
            bundle_d=bd, bundle_t=bt, gamma=1, width=1, num_beams=1,
            max_new_tokens=1, scfg=scfg, eos_token_id=EOS,
            max_total_len=prompt_padded.shape[1] + 4, mode="mjsd",
            accept_thres=thres,
        )
        return out[0][0, p_len]

    keys = jax.random.split(jax.random.key(8), N)
    draws = np.asarray(jax.vmap(one_run)(keys))

    # analytic marginal: P(tok) = q(tok)*[thres <= min(1, p/q)]
    #                    + P(reject) * max_fn(p)(tok)
    accept_mask = thres <= np.minimum(
        np.divide(p, q, out=np.zeros_like(p), where=q > 0), 1.0)
    accept_mask &= q > 0
    p_rej = float((q * (~accept_mask)).sum())
    ref = q * accept_mask + p_rej * _max_fn(p)
    tv = _tv(draws, ref, vocab)
    assert tv < TV_TOL, f"mjsd vs rule TV {tv:.4f}"


# ------------------------------------------------------------------- beam v2
def test_beam_v2_reduces_to_spec_at_one_beam(models, dists):
    """The flagship's distributional guarantee: at num_beams=1 the DP walk
    + residual updates + resample must equal plain speculative sampling,
    whose first token is exactly target-distributed."""
    bd, pd, bt, pt = models
    _, p = dists
    vocab = bt.cfg.vocab_size
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)

    def one_run(key):
        out = _beam_tree_device(
            pd, pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32),
            key,
            bundle_d=bd, bundle_t=bt, gamma=2, num_beams=1, r_slots=1,
            max_new_tokens=1, scfg=scfg, eos_token_id=EOS,
            max_total_len=prompt_padded.shape[1] + 16, mode="v2",
            expect_thres=0.7, min_num_beams=1,
        )
        return out[0][p_len]

    keys = jax.random.split(jax.random.key(9), N)
    draws = np.asarray(jax.vmap(one_run)(keys))
    tv = _tv(draws, p, vocab)
    assert tv < TV_TOL, f"beam_v2(b=1) vs target TV {tv:.4f}"


# ------------------------------------------------------------------- beam v1
def test_beam_v1_always_accept_draft_distribution(models, dists):
    """v1's accept test r-1 < ratio always passes (:845-847), so the
    committed level-0 token at num_beams=1 is exactly DRAFT-distributed —
    the reference's (quirky) semantics, reproduced."""
    bd, pd, bt, pt = models
    q, _ = dists
    vocab = bt.cfg.vocab_size
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)

    def one_run(key):
        out = _beam_tree_device(
            pd, pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32),
            key,
            bundle_d=bd, bundle_t=bt, gamma=2, num_beams=1, r_slots=1,
            max_new_tokens=1, scfg=scfg, eos_token_id=EOS,
            max_total_len=prompt_padded.shape[1] + 16, mode="v1",
            expect_thres=0.7, min_num_beams=1,
        )
        return out[0][p_len]

    keys = jax.random.split(jax.random.key(10), N)
    draws = np.asarray(jax.vmap(one_run)(keys))
    tv = _tv(draws, q, vocab)
    assert tv < TV_TOL, f"beam_v1(b=1) vs draft TV {tv:.4f}"


# --------------------------------------------------------------- random_beam
def test_random_beam_width_one_is_target_sampling(models, dists):
    bd, pd, bt, pt = models
    _, p = dists
    vocab = bt.cfg.vocab_size
    scfg = SamplingConfig(1.0, TOPK, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)

    def one_run(key):
        out = _random_beam_device(
            pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
            bundle=bt, max_num_beams=1, min_num_beams=1, max_new_tokens=1,
            scfg=scfg, eos_token_id=EOS,
            max_total_len=prompt_padded.shape[1] + 4,
        )
        return out[0][p_len]

    keys = jax.random.split(jax.random.key(11), N)
    draws = np.asarray(jax.vmap(one_run)(keys))
    tv = _tv(draws, p, vocab)
    assert tv < TV_TOL, f"random_beam(k=1) vs target TV {tv:.4f}"
