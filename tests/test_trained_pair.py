"""Trained tiny-pair quality anchor (VERDICT r3 ask #1).

Every other acceptance/quality number in the repo rides synthetic random
weights (honest, but an epistemic hole — BASELINE.md caveats). This
module trains a REAL pair in-process (pure JAX, repo-text corpus, zero
egress) and pins the three claims that need trained weights:

  1. the training loop itself learns (loss drops),
  2. a trained independent draft earns its acceptance rate from the data
     (reference pairs' mechanism, README.md:9) — far above an untrained
     draft of the same architecture,
  3. ``get_score`` parity: the speculative output's mean target log-prob
     matches the autoregressive baseline's (the reference's
     distribution-quality check, evaluation.py:109-132), and int8
     weight-only quantization moves neither score nor acceptance
     materially.

Margins are set ~2-4x wider than the measured values (acc 0.758 trained /
0.036 untrained, |score delta| 0.12 at 6 prompts x 48 tokens) so the test
catches mechanism regressions, not sampling noise.
"""

import numpy as np
import jax
import pytest

from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
from llmspeculativesampling_tpu.engine.speculative import speculative_generate
from llmspeculativesampling_tpu.evalx.metrics import get_score
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.train import build_repo_corpus, train_tiny_pair

_GEN_KW = dict(gamma=4, eos_token_id=-1, temperature=1.0, top_k=20, top_p=0.9)
_N_PROMPTS, _PROMPT_LEN, _MAX_NEW = 6, 32, 48


@pytest.fixture(scope="module")
def trained(request):
    corpus = build_repo_corpus()
    bd, pd, bt, pt, info = train_tiny_pair(
        target_hidden=96, target_layers=2, draft_hidden=48, draft_layers=1,
        heads=2, steps=150, batch=8, seq_len=64, max_position=512,
        corpus=corpus,
    )
    rng = np.random.default_rng(0)
    prompts = [
        corpus[o : o + _PROMPT_LEN].astype(np.int32)
        for o in rng.integers(0, corpus.size - _PROMPT_LEN - 8, _N_PROMPTS)
    ]
    return corpus, bd, pd, bt, pt, info, prompts


def _spec_runs(bd, pd, bt, pt, prompts):
    accs, outs = [], []
    for i, p in enumerate(prompts):
        out, det = speculative_generate(
            bd, pd, bt, pt, p, _MAX_NEW, key=jax.random.key(i), details=True,
            **_GEN_KW,
        )
        accs.append(det["acc_rate"])
        outs.append((np.asarray(out), len(p)))
    return float(np.mean(accs)), outs


def test_training_reduces_loss(trained):
    _, _, _, _, _, info, _ = trained
    (i0, l0), (i1, l1) = info["target_loss"][0], info["target_loss"][-1]
    assert i1 > i0 and l1 < 0.75 * l0, info["target_loss"]
    (j0, d0), (j1, d1) = info["draft_loss"][0], info["draft_loss"][-1]
    assert d1 < 0.75 * d0, info["draft_loss"]


def test_trained_draft_earns_acceptance(trained):
    """Acceptance comes from learning the shared distribution: the
    trained pair lands in the realistic band, an untrained draft of the
    SAME architecture accepts almost nothing. This also anchors the
    synthetic damp-sweep's 'realistic ~0.73' calibration point
    (BASELINE.md) with trained weights: measured 0.758 here."""
    _, bd, pd, bt, pt, _, prompts = trained
    acc_trained, _ = _spec_runs(bd, pd, bt, pt, prompts)
    pd_rand = jax.tree.map(
        lambda x: np.asarray(x, np.float32),
        llama.init_params(bd.cfg, jax.random.key(999)),
    )
    acc_untrained, _ = _spec_runs(bd, pd_rand, bt, pt, prompts)
    assert acc_trained >= 0.55, acc_trained
    assert acc_untrained <= 0.20, acc_untrained
    assert acc_trained > acc_untrained + 0.30


def test_get_score_parity_spec_vs_ar(trained):
    """Reference evaluation.py:109-132 on trained weights: speculative
    decoding must not degrade the target-model log-prob of the output."""
    _, bd, pd, bt, pt, _, prompts = trained
    _, spec_outs = _spec_runs(bd, pd, bt, pt, prompts)
    spec_scores = [get_score(bt, pt, o, pl) for o, pl in spec_outs]
    ar_scores = []
    for i, p in enumerate(prompts):
        out = autoregressive_generate(
            bt, pt, p, _MAX_NEW, eos_token_id=-1, temperature=1.0,
            top_k=20, top_p=0.9, key=jax.random.key(100 + i),
        )
        ar_scores.append(get_score(bt, pt, np.asarray(out), len(p)))
    d = abs(float(np.mean(spec_scores)) - float(np.mean(ar_scores)))
    assert d < 0.35, (spec_scores, ar_scores)


def test_int8_target_preserves_quality(trained):
    """int8 weight-only quantization of the TRAINED target: acceptance
    and get_score stay in band (the quality-delta claim the synthetic
    pairs could never anchor)."""
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.quant import quantize_params

    _, bd, pd, bt, pt, _, prompts = trained
    acc_fp, fp_outs = _spec_runs(bd, pd, bt, pt, prompts)
    qt = quantize_params(pt, "llama")
    bt_q = ModelBundle("llama", bt.cfg, llama.forward)
    acc_q, q_outs = _spec_runs(bd, pd, bt_q, qt, prompts)
    assert abs(acc_q - acc_fp) < 0.15, (acc_fp, acc_q)
    # score the int8 outputs with the FP target (independent judge)
    s_fp = float(np.mean([get_score(bt, pt, o, pl) for o, pl in fp_outs]))
    s_q = float(np.mean([get_score(bt, pt, o, pl) for o, pl in q_outs]))
    assert abs(s_q - s_fp) < 0.35, (s_fp, s_q)
