"""random_seed + verbose parity across engines (VERDICT r1 items #7, #10).

The reference threads ``random_seed`` through every entry point but only
*consumes* it where it reseeds before an accept draw:
  * speculative_sampling (:1976-1977), speculative_sampling_v2 (:2150-2151),
  * multi_speculative_sampling (:1619-1620) — shared verify loop, so the
    'beam' strategy too,
  * mjsd reseeds before a commented-out draw (:1286-1288; active path uses
    r = accept_thres) — no observable effect,
  * beam v1/v2 (:589/:23) and BiLD (:1723) accept it and never reseed.
Reseeding before every draw makes all r draws equal one fixed uniform.
Functional check: with the PRNG key held fixed, two very different fixed
uniforms must change the accept pattern (if the seed were ignored, the
runs would be bit-identical) while the same seed stays reproducible.
"""

import io
import contextlib

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
EOS = -1  # never generated: keep runs full length


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


def _seed_with_uniform(lo, hi):
    """Find a seed s with uniform(key(s)) in [lo, hi)."""
    for s in range(500):
        u = float(jax.random.uniform(jax.random.key(s), ()))
        if lo <= u < hi:
            return s
    raise AssertionError("no seed found")


SEED_LOW = _seed_with_uniform(0.0, 0.02)    # r ~ 0  -> accept almost all
SEED_HIGH = _seed_with_uniform(0.98, 1.0)   # r ~ 1  -> reject almost all


@pytest.fixture(scope="module")
def near_pair(models):
    """Draft + target = same net with 1%% weight noise: p/q clusters near 1,
    so r~0 accepts nearly all and r~1 rejects a real fraction — maximal
    sensitivity to the fixed accept draw."""
    bd, pd, _, _ = models
    noise = jax.tree_util.tree_map(
        lambda x: x * (1.0 + 0.01 * jax.random.normal(
            jax.random.key(99), x.shape, x.dtype)), pd)
    return bd, pd, bd, noise


@pytest.mark.parametrize("seed", [SEED_LOW, SEED_HIGH])
def test_spec_v2_reproducible(models, seed):
    bd, pd, bt, pt = models
    kw = dict(gamma=3, eos_token_id=EOS, top_k=10, key=jax.random.key(5),
              random_seed=seed)
    a = speculative_generate_v2(bd, pd, bt, pt, PROMPT, 12, **kw)
    b = speculative_generate_v2(bd, pd, bt, pt, PROMPT, 12, **kw)
    np.testing.assert_array_equal(a, b)


def _differs(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return a.shape != b.shape or not np.array_equal(a, b)


def test_spec_v2_fixed_r_reaches_accept(models):
    bd, pd, bt, pt = models
    kw = dict(gamma=4, eos_token_id=EOS, top_k=10, key=jax.random.key(5),
              details=True)
    out_lo, d_lo = speculative_generate_v2(bd, pd, bt, pt, PROMPT, 16,
                                           random_seed=SEED_LOW, **kw)
    out_hi, d_hi = speculative_generate_v2(bd, pd, bt, pt, PROMPT, 16,
                                           random_seed=SEED_HIGH, **kw)
    # identical key: only the fixed r differs -> accept pattern must change
    assert _differs(out_lo, out_hi) or d_lo["accepted_count"] != d_hi["accepted_count"]
    assert d_lo["accepted_count"] >= d_hi["accepted_count"]


def test_multi_iid_fixed_r_reaches_accept(models):
    bd, pd, bt, pt = models
    kw = dict(gamma=3, width=3, eos_token_id=EOS, top_k=10,
              key=jax.random.key(6), details=True)
    out_lo, d_lo = multi_speculative_generate(bd, pd, bt, pt, PROMPT, 12,
                                              random_seed=SEED_LOW, **kw)
    out_hi, d_hi = multi_speculative_generate(bd, pd, bt, pt, PROMPT, 12,
                                              random_seed=SEED_HIGH, **kw)
    assert _differs(out_lo, out_hi) or d_lo["accepted_count"] != d_hi["accepted_count"]
    assert d_lo["accepted_count"] >= d_hi["accepted_count"]


def test_multi_beam_fixed_r_reaches_accept(near_pair):
    # top_k=0: the beam strategy's q is the unwarped per-beam softmax while
    # p is warped, so top-k filtering pins p/q >= 1; unfiltered, the
    # near-identical pair puts the sampled-token ratios at 1 +/- eps where
    # the fixed r actually discriminates.
    bd, pd, bt, pt = near_pair
    kw = dict(gamma=3, width=3, num_beams=4, eos_token_id=EOS, top_k=0,
              key=jax.random.key(7), details=True)
    out_lo, d_lo = multi_beam_generate(bd, pd, bt, pt, PROMPT, 16,
                                       random_seed=SEED_LOW, **kw)
    out_hi, d_hi = multi_beam_generate(bd, pd, bt, pt, PROMPT, 16,
                                       random_seed=SEED_HIGH, **kw)
    assert _differs(out_lo, out_hi) or d_lo["accepted_count"] != d_hi["accepted_count"]
    assert d_lo["accepted_count"] >= d_hi["accepted_count"]


def test_signature_parity_accepting_engines(models):
    """mjsd / BiLD / beam v1 / beam v2 accept random_seed without error
    (reference accepts it in all 9 entry points) and stay reproducible."""
    bd, pd, bt, pt = models
    runs = [
        lambda: mjsd_generate(bd, pd, bt, pt, PROMPT, 8, gamma=2, width=3,
                              num_beams=3, accept_thres=0.1, eos_token_id=EOS,
                              top_k=10, key=jax.random.key(8), random_seed=42),
        lambda: bild_generate(bd, pd, bt, pt, PROMPT, 8, gamma=4,
                              eos_token_id=EOS, top_k=10,
                              key=jax.random.key(9), random_seed=42),
        lambda: beam_speculative_generate(bd, pd, bt, pt, PROMPT, 8, gamma=2,
                                          num_beams=2, eos_token_id=EOS,
                                          top_k=10, key=jax.random.key(10),
                                          random_seed=42),
        lambda: beam_speculative_v2_generate(bd, pd, bt, pt, PROMPT, 8,
                                             gamma=2, num_beams=2,
                                             eos_token_id=EOS, top_k=10,
                                             key=jax.random.key(11),
                                             random_seed=42),
    ]
    for fn in runs:
        np.testing.assert_array_equal(fn(), fn())


def test_verbose_streams_tokens(models):
    """verbose=True streams per-token lines with the reference's ANSI codes
    (speculative_sampling.py:1986-2021) and an end-of-run summary (:2053)."""
    bd, pd, bt, pt = models
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = speculative_generate(
            bd, pd, bt, pt, PROMPT, 8, gamma=3, eos_token_id=EOS, top_k=10,
            key=jax.random.key(12), verbose=True,
        )
    text = buf.getvalue()
    assert len(out) > len(PROMPT)
    # at least one target sample/resample line per step; accepted lines red
    assert "\033[34m" in text or "\033[35m" in text
    assert "generated tokens numbers" in text
    assert "Acc rate:" in text


def test_verbose_matches_fused_tokens(models):
    bd, pd, bt, pt = models
    kw = dict(gamma=3, eos_token_id=EOS, top_k=10, key=jax.random.key(13))
    fused = speculative_generate(bd, pd, bt, pt, PROMPT, 10, **kw)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        verbose = speculative_generate(bd, pd, bt, pt, PROMPT, 10,
                                       verbose=True, **kw)
    np.testing.assert_array_equal(fused, verbose)
