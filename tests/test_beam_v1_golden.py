"""Frozen in-repo golden for MULTI-ROUND beam_v1 semantics.

The reference's own ``beam_speculative_sampling`` crashes on essentially
every multi-round run (the r-1 always-accept at speculative_sampling.py:
845-849 drives norm-logits into a NaN raise at :908 / utils.py:203-207 —
verified in source), so differential CI (tests/test_ref_differential.py)
can only pin SINGLE rounds. This test freezes OUR engine's multi-round
behavior instead: a seeded 24-token run's committed tokens and per-step
advanced-level counts are stored as a golden (VERDICT r3 ask #6), plus
the structural always-accept properties that must hold under the r-1
quirk regardless of weights. Drift in ``_v1_walk`` now fails CI without
needing the reference to survive.

Regenerate (only after an INTENDED semantic change, with the diff
explained in the commit): run this file with REGEN_BEAM_V1_GOLDEN=1.
"""

import json
import os
import pathlib

import numpy as np
import jax
import pytest

from llmspeculativesampling_tpu.engine.beam_tree import beam_speculative_generate

from test_speculative import make_bundle, PROMPT, EOS

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "beam_v1_multiround.json"
MAX_NEW = 24
GAMMA = 3
NUM_BEAMS = 4


def _run():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    out, d = beam_speculative_generate(
        bd, pd, bt, pt, PROMPT, MAX_NEW, gamma=GAMMA, num_beams=NUM_BEAMS,
        min_num_beams=1, eos_token_id=EOS, temperature=1.0, top_k=10,
        top_p=0.9, key=jax.random.key(7), details=True,
    )
    return out, d


@pytest.fixture(scope="module")
def run():
    return _run()


def test_v1_multiround_always_accept_properties(run):
    """Structural invariants of the r-1 quirk (reference :845-849): the
    accept draw is uniform-minus-one (always below any non-negative
    ratio — including the 0/q of an invalid-parent row), so every level
    accepts, every step advances all gamma levels with min_num_beams=1,
    and the reported acceptance rate is exactly 1.0 (the 'rescore'
    semantics in docs/PERFORMANCE.md's engine table; invalid parents are
    excluded through the ``valid`` mask, not the accept draw)."""
    out, d = run
    assert d["target_call_times"] >= 2, "run must be multi-round"
    assert all(l == GAMMA for l in d["acc_len"]), d["acc_len"]
    assert d["accepted_count"] == GAMMA * d["target_call_times"]
    assert d["acc_rate"] == pytest.approx(1.0)


def test_v1_multiround_matches_golden(run):
    out, d = run
    current = {
        "tokens": np.asarray(out).tolist(),
        "acc_len": [int(x) for x in d["acc_len"]],
        "target_call_times": int(d["target_call_times"]),
        "accepted_count": int(d["accepted_count"]),
        "acc_rate": round(float(d["acc_rate"]), 6),
    }
    if os.environ.get("REGEN_BEAM_V1_GOLDEN"):
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(current, indent=1) + "\n")
        pytest.skip("golden regenerated")
    golden = json.loads(GOLDEN.read_text())
    assert current == golden, (
        "multi-round beam_v1 drift vs frozen golden — if the change is an "
        "intended semantic fix, regenerate with REGEN_BEAM_V1_GOLDEN=1 "
        f"and justify in the commit.\n got: {current}\n want: {golden}"
    )
