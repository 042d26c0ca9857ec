"""Reference-differential CI: our engines vs the reference's OWN code.

VERDICT round-2 ask #1.  For each of the 9 exported algorithms
(/root/reference/sampling/__init__.py:1-7) this module runs the
reference's torch implementation and our JAX engine on IDENTICAL tiny
weights (shared via core/loader.py::llama_params_from_state_dict, see
tests/_ref_oracle.py) and compares:

  * first-generated-token empirical distributions (TV distance, plus an
    exact support check for the lossless algorithms — every sampled token
    must lie in the support of the reference's own
    ``norm_logits``-filtered target distribution),
  * acc_len / acc_rate acceptance profiles at matched configs
    (reference speculative_sampling.py:18-2194),
  * details-dict schema keys (ours must be a superset of the
    reference's, e.g. speculative_sampling.py:2061-2074).

Statistical thresholds: two empirical histograms of N draws over a
support of ~20 tokens (top_k=20 harness setting, evaluation.py:254) have
expected TV ≈ sqrt(20/(pi*N)) ≈ 0.16 at N=256; thresholds sit ≈2x above
that.  A draft/target swap or a filter-order bug moves TV well past 0.4
on these perturbed-pair models.
"""

import contextlib
import io
import random

import numpy as np
import pytest
import torch
import jax

import _ref_oracle as R
from _ref_oracle import EOS, PREFIX, tv_distance

import llmspeculativesampling_tpu as L

# Shared sampling config — the reference harness's values (evaluation.py:254-255).
TEMP, TOP_K, TOP_P = 1.0, 20, 0.9
P_LEN = len(PREFIX)


@pytest.fixture(scope="module")
def models():
    return R.shared_models()


def _sampling_mod():
    return R.reference()


# --------------------------------------------------------------------------
# runners: (name) -> first generated token, for one seeded call
# --------------------------------------------------------------------------

def ref_run(name, seed, max_len, details=False):
    s = _sampling_mod()
    td, tt, *_ = R.shared_models()
    x = R.prefix_tensor()
    torch.manual_seed(seed)
    np.random.seed(seed % (2**31))
    random.seed(seed)  # random_width_beam_sampling draws widths from
    # the python `random` module (autoregressive_sampling.py:136)
    common = dict(temperature=TEMP, top_k=TOP_K, top_p=TOP_P)
    with contextlib.redirect_stdout(io.StringIO()):  # ref debug prints
        return _ref_dispatch(name, s, td, tt, x, max_len, details, common)


def _ref_dispatch(name, s, td, tt, x, max_len, details, common):
    if name == "ar":
        out = s.autoregressive_sampling(x, tt, max_len, EOS, **common)
        return out, None
    if name == "random_beam":
        out = s.random_width_beam_sampling(
            x, tt, max_len, EOS, max_num_beams=3, min_num_beams=1, **common)
        return out, None
    if name == "spec":
        return s.speculative_sampling(
            x, td, tt, EOS, EOS, max_len, gamma=4, details=details, **common)
    if name == "spec_v2":
        return s.speculative_sampling_v2(
            x, td, tt, max_len, gamma=4, details=details, **common)
    if name == "multi_iid":
        return s.multi_speculative_sampling(
            x, td, tt, EOS, EOS, max_len, gamma=3, width=3, strategy="iid",
            details=details, **common)
    if name == "multi_beam":
        return s.multi_speculative_sampling(
            x, td, tt, EOS, EOS, max_len, gamma=3, width=3, num_beams=3,
            strategy="beam", details=details, **common)
    if name == "mjsd":
        return s.mjsd_speculative_sampling(
            x, td, tt, EOS, EOS, max_len, gamma=3, width=3, num_beams=3,
            accept_thres=0.1, details=details, **common)
    if name == "bild":
        return s.BiLD_sampling(
            x, td, tt, 5, EOS, EOS, 0.5, 5.0, max_len,
            details=details, **common)
    if name == "beam_v1":
        return s.beam_speculative_sampling(
            x, td, tt, EOS, EOS, max_len, gamma=3, width=3, num_beams=3,
            details=details, **common)
    if name == "beam_v2":
        return s.beam_speculative_sampling_v2(
            x, td, tt, EOS, EOS, max_len, gamma=3, width=3, num_beams=3,
            extra_sample_cnt=1, expect_thres=0.7, details=details, **common)
    raise KeyError(name)


def our_run(name, seed, max_new, details=False):
    _, _, bd, pd, bt, pt = R.shared_models()
    key = jax.random.key(seed)
    common = dict(eos_token_id=EOS, temperature=TEMP, top_k=TOP_K,
                  top_p=TOP_P, key=key, details=details)
    if name == "ar":
        return L.autoregressive_generate(bt, pt, PREFIX, max_new, **common)
    if name == "random_beam":
        return L.random_width_beam_generate(
            bt, pt, PREFIX, max_new, max_num_beams=3, min_num_beams=1, **common)
    if name == "spec":
        return L.speculative_generate(bd, pd, bt, pt, PREFIX, max_new, gamma=4, **common)
    if name == "spec_v2":
        return L.speculative_generate_v2(bd, pd, bt, pt, PREFIX, max_new, gamma=4, **common)
    if name == "multi_iid":
        return L.multi_speculative_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=3, width=3, strategy="iid", **common)
    if name == "multi_beam":
        return L.multi_beam_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=3, width=3, num_beams=3, **common)
    if name == "mjsd":
        return L.mjsd_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=3, width=3, num_beams=3,
            accept_thres=0.1, **common)
    if name == "bild":
        return L.bild_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=5,
            fallback_thres=0.5, rollback_thres=5.0, **common)
    if name == "beam_v1":
        return L.beam_speculative_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=3, width=3, num_beams=3, **common)
    if name == "beam_v2":
        return L.beam_speculative_v2_generate(
            bd, pd, bt, pt, PREFIX, max_new, gamma=3, width=3, num_beams=3,
            extra_sample_cnt=1, expect_thres=0.7, **common)
    raise KeyError(name)


def _first_tok_ref(name, n):
    """n first-token draws from the reference. beam_v1 crashes on a
    sizeable fraction of runs even at max_len=2 (see
    test_beam_v1_reference_crashes); skip crashed seeds, cap attempts."""
    toks = []
    seed = 0
    while len(toks) < n and seed < 3 * n:
        seed += 1
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                out = ref_run(name, 1000 + seed, 2)[0]
        except RuntimeError:
            if name != "beam_v1":
                raise
            continue
        # some reference paths return a squeezed 1-D sequence
        toks.append(int(torch.as_tensor(out).reshape(-1)[P_LEN]))
    assert len(toks) == n, f"{name}: only {len(toks)}/{n} reference runs survived"
    return np.array(toks)


def _first_tok_ours(name, n):
    toks = []
    for seed in range(n):
        out = our_run(name, seed, 2)
        out = out[0] if isinstance(out, tuple) else out
        toks.append(int(np.asarray(out).reshape(-1)[P_LEN]))
    return np.array(toks)


def exact_first_token_dist():
    """The reference's own filtered target distribution at the prefix end."""
    s = _sampling_mod()
    _, tt, *_ = R.shared_models()
    with torch.no_grad():
        logits = tt(R.prefix_tensor()).logits[:, -1, :]
    from sampling.utils import norm_logits  # the reference's L0 (utils.py:182-210)

    return norm_logits(logits, TEMP, TOP_K, TOP_P)[0].numpy()


def our_exact_first_token_dist():
    """Our filtered target distribution at the prefix end (same weights)."""
    import jax.numpy as jnp
    from llmspeculativesampling_tpu.ops.sampling import (
        SamplingConfig, norm_logits as our_norm,
    )

    _, _, _, _, bt, pt = R.shared_models()
    cache = bt.make_cache(1, 32)
    logits, _ = bt.forward(pt, bt.cfg, jnp.asarray(np.array(R.prefix_tensor())), cache)
    return np.asarray(
        our_norm(jnp.asarray(logits[:, -1]), SamplingConfig(TEMP, TOP_K, TOP_P))
    )[0]


# --------------------------------------------------------------------------
# 0. anchor: the shared weights really are shared
# --------------------------------------------------------------------------

def test_logit_parity_anchor(models):
    """Torch fork logits == our JAX logits on the same weights (the 4.35-era
    fork's rotary cache ordering differs from HF 4.57 at the ~3e-3 level;
    distribution-level agreement is what the suite needs)."""
    td, tt, bd, pd, bt, pt = models
    import jax.numpy as jnp

    x = R.prefix_tensor()
    with torch.no_grad():
        ref_logits = tt(x).logits.float().numpy()
    cache = bt.make_cache(1, 32)
    ours, _ = bt.forward(pt, bt.cfg, jnp.asarray(np.array(x)), cache)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-2)


# --------------------------------------------------------------------------
# 1. first-token TV distance, all 9 entry points
# --------------------------------------------------------------------------

# (name, n_runs, tv_threshold). Beam-family runs are slower per call, so
# fewer draws and a proportionally wider threshold.
FIRST_TOKEN_CASES = [
    ("ar", 256, 0.30),
    ("spec", 256, 0.30),
    ("spec_v2", 256, 0.30),
    ("multi_iid", 192, 0.33),
    ("multi_beam", 128, 0.38),
    ("mjsd", 128, 0.38),
    ("bild", 192, 0.33),
    ("beam_v1", 96, 0.42),
    ("beam_v2", 96, 0.42),
    ("random_beam", 128, 0.38),
]

LOSSLESS = {"ar", "spec", "spec_v2"}  # first token exactly target-distributed


@pytest.mark.parametrize("name,n,thresh", FIRST_TOKEN_CASES,
                         ids=[c[0] for c in FIRST_TOKEN_CASES])
def test_first_token_distribution(models, name, n, thresh):
    ref_toks = _first_tok_ref(name, n)
    our_toks = _first_tok_ours(name, n)
    tv = tv_distance(ref_toks, our_toks)
    assert tv < thresh, (
        f"{name}: first-token TV(ref, ours) = {tv:.3f} >= {thresh} over {n} runs"
    )
    if name in LOSSLESS:
        # Exact support checks, each framework against its own filtered
        # target distribution (the supports legitimately differ by a
        # boundary token: the 4.35-era fork's rotary tables sit ~3e-3 off
        # ours — see test_logit_parity_anchor — which can swap the
        # nucleus-edge token). A wrong filter ORDER breaks containment
        # massively in both frameworks.
        exact = exact_first_token_dist()
        assert set(ref_toks.tolist()) <= set(np.nonzero(exact > 0)[0].tolist())
        our_exact = our_exact_first_token_dist()
        assert set(our_toks.tolist()) <= set(np.nonzero(our_exact > 0)[0].tolist()), (
            f"{name}: sampled tokens outside our own filtered support"
        )
        # sharper one-sided checks vs each exact distribution
        tv_exact = 0.5 * np.abs(
            np.bincount(our_toks, minlength=R.VOCAB) / n - our_exact
        ).sum()
        assert tv_exact < thresh
        # and cross-framework: the two exact dists themselves must agree
        assert 0.5 * np.abs(exact - our_exact).sum() < 0.1


# --------------------------------------------------------------------------
# 2. acceptance profiles at matched configs
# --------------------------------------------------------------------------

PROFILE_CASES = ["spec", "spec_v2", "multi_iid", "multi_beam", "mjsd",
                 "beam_v2"]
PROFILE_SEEDS = 10
PROFILE_LEN = 24


def _profile(run, seeds):
    acc_lens, acc_rates = [], []
    for seed in seeds:
        _, d = run(seed)
        acc_lens += [float(a) for a in d["acc_len"]]
        r = d["acc_rate"]
        acc_rates.append(float(np.mean(r)) if np.ndim(r) else float(r))
    return float(np.mean(acc_lens)), float(np.mean(acc_rates))


@pytest.mark.parametrize("name", PROFILE_CASES)
def test_acceptance_profile(models, name):
    ref_len, ref_rate = _profile(
        lambda s: ref_run(name, 2000 + s, PROFILE_LEN, details=True),
        range(PROFILE_SEEDS))
    our_len, our_rate = _profile(
        lambda s: our_run(name, 100 + s, PROFILE_LEN, details=True),
        range(PROFILE_SEEDS))
    assert abs(ref_len - our_len) < 0.5, (
        f"{name}: mean acc_len ref {ref_len:.3f} vs ours {our_len:.3f}")
    assert abs(ref_rate - our_rate) < 0.15, (
        f"{name}: mean acc_rate ref {ref_rate:.3f} vs ours {our_rate:.3f}")


def test_multi_beam_row_compat_profile(models):
    """The bug-compat mode (reference q-buffer row misalignment,
    beam_spec.py ref_row_compat) must also sit inside the reference's
    acceptance envelope — at tiny scale the misalignment moves the
    numbers by less than sampling noise."""
    ref_len, _ = _profile(
        lambda s: ref_run("multi_beam", 2000 + s, PROFILE_LEN, details=True),
        range(PROFILE_SEEDS))
    _, _, bd, pd, bt, pt = R.shared_models()
    our_len, _ = _profile(
        lambda s: L.multi_beam_generate(
            bd, pd, bt, pt, PREFIX, PROFILE_LEN, gamma=3, width=3,
            num_beams=3, eos_token_id=EOS, temperature=TEMP, top_k=TOP_K,
            top_p=TOP_P, key=jax.random.key(200 + s), details=True,
            ref_row_compat=True),
        range(PROFILE_SEEDS))
    assert abs(ref_len - our_len) < 0.5


# --------------------------------------------------------------------------
# 2b. beam_v1: the reference implementation crashes on most runs
# --------------------------------------------------------------------------
#
# beam_speculative_sampling's accept draw is r = rand(1) - 1 in [-1, 0)
# (speculative_sampling.py:845-849), so every level with any valid-parent
# sample always accepts (p/q >= 0 > r); the all-accept resample path then
# dies with 'norm logits error' (:908, utils.py:203-207) or an empty
# valid-beam sample (-> raise at :1071) on essentially every multi-round
# run. No active reference harness block calls beam_v1 (evaluation.py's
# sweep uses v2). The differential comparison is therefore restricted to
# single-round runs (max_len=2), where a usable fraction survives.

def test_beam_v1_reference_crashes_multiround(models):
    """Documents the reference crash: 24-token beam_v1 runs on the shared
    pair die before completing. If a transformers upgrade ever makes the
    reference survive, this xpass tells us to widen the v1 comparison."""
    crashed = 0
    for seed in range(5):
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                ref_run("beam_v1", 4000 + seed, 24, details=True)
        except RuntimeError:
            crashed += 1
    assert crashed == 5


def test_beam_v1_first_round_profile(models):
    """First-round acc_len on surviving reference runs vs ours: both must
    show the always-accept semantics (acc_len == gamma on nearly every
    round) — proving our walk reproduces the r-1 quirk, not a
    'fixed' stricter accept rule."""
    ref_lens = []
    seed = 0
    while len(ref_lens) < 12 and seed < 60:
        seed += 1
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                _, d = ref_run("beam_v1", 5000 + seed, 2, details=True)
        except RuntimeError:
            continue
        ref_lens += [float(a) for a in d["acc_len"]][:1]
    assert len(ref_lens) >= 8, "too few surviving reference beam_v1 runs"
    our_lens = []
    for s in range(12):
        _, d = our_run("beam_v1", 300 + s, 2, details=True)
        our_lens += [float(a) for a in d["acc_len"]][:1]
    assert abs(np.mean(ref_lens) - np.mean(our_lens)) < 0.5, (
        f"beam_v1 first-round acc_len: ref {np.mean(ref_lens):.2f} "
        f"vs ours {np.mean(our_lens):.2f}")


# --------------------------------------------------------------------------
# 3. details schema: ours ⊇ reference's, taken from the reference itself
# --------------------------------------------------------------------------

SCHEMA_CASES = ["spec", "spec_v2", "multi_iid", "multi_beam", "mjsd",
                "bild", "beam_v1", "beam_v2"]


@pytest.mark.parametrize("name", SCHEMA_CASES)
def test_details_schema_superset(models, name):
    ref_d = None
    # beam_v1 crashes on most multi-round runs (see 2b above): single
    # round only, retry seeds.
    max_len = 2 if name == "beam_v1" else 8
    for seed in range(1, 40):
        try:
            _, ref_d = ref_run(name, seed, max_len, details=True)
            break
        except RuntimeError:
            if name != "beam_v1":
                raise
    assert ref_d is not None, f"{name}: no reference run survived"
    out = our_run(name, 1, 8, details=True)
    our_d = out[1]
    missing = set(ref_d.keys()) - set(our_d.keys())
    assert not missing, f"{name}: details keys missing vs reference: {missing}"


# --------------------------------------------------------------------------
# 4. OPT family: the reference's forked modeling_opt inside its own loops
# --------------------------------------------------------------------------
#
# The algorithm layer is differentially proven on llama above; these runs
# swap in the OPT model core (reference modeling_opt.py, the
# explicit-positions patch) on both sides and re-check the lossless spec
# properties — proving OPT model parity end-to-end, not just logit parity.

@pytest.fixture(scope="module")
def opt_models():
    return R.shared_opt_models()


def test_opt_logit_parity_anchor(opt_models):
    td, tt, bd, pd, bt, pt = opt_models
    import jax.numpy as jnp

    x = R.prefix_tensor()
    with torch.no_grad():
        ref_logits = tt(x).logits.float().numpy()
    cache = bt.make_cache(1, 32)
    ours, _ = bt.forward(pt, bt.cfg, jnp.asarray(np.array(x)), cache)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-2)


def _opt_ref_spec(seed, max_len, details=False):
    s = _sampling_mod()
    td, tt, *_ = R.shared_opt_models()
    torch.manual_seed(seed)
    with contextlib.redirect_stdout(io.StringIO()):
        return s.speculative_sampling(
            R.prefix_tensor(), td, tt, EOS, EOS, max_len, gamma=4,
            temperature=TEMP, top_k=TOP_K, top_p=TOP_P, details=details)


def _opt_our_spec(seed, max_new, details=False):
    _, _, bd, pd, bt, pt = R.shared_opt_models()
    return L.speculative_generate(
        bd, pd, bt, pt, PREFIX, max_new, gamma=4, eos_token_id=EOS,
        temperature=TEMP, top_k=TOP_K, top_p=TOP_P,
        key=jax.random.key(seed), details=details)


def test_opt_spec_first_token_distribution(opt_models):
    n, thresh = 192, 0.33
    ref_toks = []
    for seed in range(n):
        out = _opt_ref_spec(1000 + seed, 2)
        ref_toks.append(int(torch.as_tensor(out).reshape(-1)[P_LEN]))
    our_toks = []
    for seed in range(n):
        out = _opt_our_spec(seed, 2)
        our_toks.append(int(np.asarray(out).reshape(-1)[P_LEN]))
    tv = tv_distance(np.array(ref_toks), np.array(our_toks))
    assert tv < thresh, f"opt spec first-token TV {tv:.3f} >= {thresh}"


def test_opt_spec_acceptance_profile(opt_models):
    ref_len, ref_rate = _profile(
        lambda s: _opt_ref_spec(2000 + s, PROFILE_LEN, details=True),
        range(PROFILE_SEEDS))
    our_len, our_rate = _profile(
        lambda s: _opt_our_spec(100 + s, PROFILE_LEN, details=True),
        range(PROFILE_SEEDS))
    assert abs(ref_len - our_len) < 0.5, (
        f"opt spec acc_len ref {ref_len:.3f} vs ours {our_len:.3f}")
    assert abs(ref_rate - our_rate) < 0.15, (
        f"opt spec acc_rate ref {ref_rate:.3f} vs ours {our_rate:.3f}")
