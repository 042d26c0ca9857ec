"""bench.py acceptance-sensitivity sweep (VERDICT r1 #5) on tiny models."""

import numpy as np

import bench
from llmspeculativesampling_tpu.core.synthetic import synthetic_pair


def test_acceptance_sweep_shape_and_monotonicity():
    def make_pair(damp):
        return synthetic_pair(
            "llama", hidden_size=64, num_layers=4, draft_layers=2,
            num_heads=4, vocab_size=256, max_position=512, dtype="float32",
            damp=damp)

    prompt = list(np.random.default_rng(0).integers(5, 250, 16))
    gen_kw = dict(eos_token_id=-1, temperature=1.0, top_k=20, top_p=0.9)
    old_new = bench.MAX_NEW
    bench.MAX_NEW = 16
    try:
        rows = bench.acceptance_sweep(1.0, prompt, gen_kw, make_pair)
    finally:
        bench.MAX_NEW = old_new
    assert len(rows) == 3
    for r in rows:
        assert set(r) == {"damp", "acc_rate", "best_gamma", "tokens_per_s", "vs_ar"}
        assert 0.0 <= r["acc_rate"] <= 1.0
        assert r["best_gamma"] in (8, 16, 24)
        assert r["tokens_per_s"] > 0
    # more damping of the non-shared layers => draft approximates better
    accs = [r["acc_rate"] for r in rows]
    assert accs[0] >= accs[-1] - 0.05  # damp=0.008 at least as accepted as 0.12
