"""Trained tiny-pair quality anchor at chip scale (VERDICT r3 ask #1).

Trains a byte-level target (4L/256h) + independent draft (2L/128h) on the
repo corpus ON THE TPU, then measures the three numbers BASELINE.md's
"trained tiny pair" rows quote:

  * trained-pair acceptance rate at the reference knobs (gamma=4,
    top_k=20, top_p=0.9) — the anchor for the synthetic damp-sweep's
    "realistic" calibration;
  * get_score parity: mean target log-prob of speculative vs
    autoregressive outputs (reference evaluation.py:109-132);
  * int8-vs-fp32 quality: acceptance delta, get_score delta, and
    ROUGE-1/2/L of generated continuations against the true corpus
    continuation for both weight formats.

Round 5: trains on the FROZEN corpus snapshot (train/corpus_snapshot.bin.gz)
so the measurement is reproducible across doc edits, and the get_score
parity number ships as a PAIRED bootstrap CI (per-prompt spec−AR deltas,
95% percentile bootstrap) instead of a point delta.

Usage: python scripts/exp_trained_pair.py [--steps 2000] [--prompts 64]
Prints one JSON dict. Single TPU process (axon serializes clients).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--prompts", type=int, default=64)
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--seq_len", type=int, default=256)
    args = ap.parse_args()

    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.evalx.metrics import get_score, rouge
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.quant import quantize_params
    from llmspeculativesampling_tpu.train import pinned_corpus, train_tiny_pair

    print("devices:", jax.devices(), file=sys.stderr)
    corpus = pinned_corpus()
    t0 = time.time()
    bd, pd, bt, pt, info = train_tiny_pair(
        target_hidden=256, target_layers=4, draft_hidden=128, draft_layers=2,
        heads=4, steps=args.steps, batch=32, seq_len=args.seq_len,
        max_position=1024, corpus=corpus,
    )
    train_wall = time.time() - t0
    print(f"train {train_wall:.0f}s target_loss={info['target_loss']} "
          f"draft_loss={info['draft_loss']}", file=sys.stderr)

    # held-out-ish prompts: random corpus windows (the pair memorizes
    # style, not exact windows, at this capacity)
    rng = np.random.default_rng(7)
    plen = 48
    offs = rng.integers(0, corpus.size - plen - args.max_new - 8, args.prompts)
    prompts = [corpus[o : o + plen].astype(np.int32) for o in offs]
    true_cont = [
        bytes(corpus[o + plen : o + plen + args.max_new]).decode("latin-1")
        for o in offs
    ]
    kw = dict(gamma=4, eos_token_id=-1, temperature=1.0, top_k=20, top_p=0.9)

    def run_pair(bt_, pt_, tag):
        accs, outs, scores = [], [], []
        for i, p in enumerate(prompts):
            out, det = speculative_generate(
                bd, pd, bt_, pt_, p, args.max_new, key=jax.random.key(i),
                details=True, **kw,
            )
            accs.append(det["acc_rate"])
            o = np.asarray(out)
            outs.append(bytes(o[plen:].astype(np.uint8)).decode("latin-1"))
            scores.append(get_score(bt, pt, o, plen))  # fp32 target judges
        r = rouge(outs, true_cont)
        return scores, {
            f"acc_{tag}": round(float(np.mean(accs)), 4),
            f"score_{tag}": round(float(np.mean(scores)), 4),
            f"rouge1_{tag}": round(r["rouge1"], 4),
            f"rouge2_{tag}": round(r["rouge2"], 4),
            f"rougeL_{tag}": round(r["rougeL"], 4),
        }

    def bootstrap_ci(deltas, n_boot=4000, seed=0):
        rng = np.random.default_rng(seed)
        n = deltas.size
        means = np.array([deltas[rng.integers(0, n, n)].mean() for _ in range(n_boot)])
        return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))

    res = {"train_wall_s": round(train_wall, 1),
           "target_loss": info["target_loss"][-1][1],
           "draft_loss": info["draft_loss"][-1][1],
           "corpus_bytes": info["corpus_bytes"],
           "n_prompts": args.prompts, "max_new": args.max_new}
    spec_scores, block = run_pair(bt, pt, "fp32")
    res.update(block)

    ar_scores = []
    for i, p in enumerate(prompts):
        out = autoregressive_generate(
            bt, pt, p, args.max_new, eos_token_id=-1, temperature=1.0,
            top_k=20, top_p=0.9, key=jax.random.key(1000 + i),
        )
        ar_scores.append(get_score(bt, pt, np.asarray(out), plen))
    res["score_ar"] = round(float(np.mean(ar_scores)), 4)
    # paired per-prompt deltas (same prompt for spec and AR) + bootstrap CI:
    # the published parity claim is this CI, not the point delta.
    deltas = np.asarray(spec_scores) - np.asarray(ar_scores)
    lo, hi = bootstrap_ci(deltas)
    res["score_parity_delta"] = round(float(deltas.mean()), 4)
    res["score_parity_se"] = round(float(deltas.std(ddof=1) / np.sqrt(deltas.size)), 4)
    res["score_parity_ci95"] = [round(lo, 4), round(hi, 4)]

    qt = quantize_params(pt, "llama")
    bt_q = ModelBundle("llama", bt.cfg, llama.forward)
    _, block_q = run_pair(bt_q, qt, "int8")
    res.update(block_q)
    res["acc_delta_int8"] = round(res["acc_int8"] - res["acc_fp32"], 4)
    res["score_delta_int8"] = round(res["score_int8"] - res["score_fp32"], 4)

    # fp8 e4m3 weight-only on the SAME trained target (VERDICT r4 #4):
    # the quality side of the int8-vs-fp8 comparison (perf side:
    # scripts/exp_fp8_bench.py)
    qt_f = quantize_params(pt, "llama", fmt="fp8_e4m3")
    bt_f = ModelBundle("llama", bt.cfg, llama.forward)
    _, block_f = run_pair(bt_f, qt_f, "fp8")
    res.update(block_f)
    res["acc_delta_fp8"] = round(res["acc_fp8"] - res["acc_fp32"], 4)
    res["score_delta_fp8"] = round(res["score_fp8"] - res["score_fp32"], 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
