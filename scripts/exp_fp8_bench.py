"""FP8 (e4m3) vs INT8 weight-only at Llama-2-13B geometry on one v5e chip
(VERDICT r4 ask #4; north-star BASELINE.json "INT8/FP8").

Both formats are 1 byte/weight, so the decode bottleneck (weight HBM
reads) is identical and the MXU computes in bf16 either way — the
measurable difference can only come from the convert-widen op XLA fuses
into the dot (int8->bf16 vs f8e4m3->bf16). Quality differences are
measured separately on the trained tiny pair (exp_trained_pair.py
--fmt fp8_e4m3): per-channel-scaled int8's uniform 255-level grid beats
e4m3's 3-mantissa-bit float grid at equal bytes (quant/core.py analysis).

Methodology: born-int8 vs born-fp8 13B pairs sharing the same weight
codes (core/synthetic.py synthetic_pair_int8(fmt=...) casts inside the
generation jit — a post-hoc s8->f8 convert cannot alias the donated
buffer and OOMs the chip). Same process, back-to-back, median-of-N.

Usage: python scripts/exp_fp8_bench.py [--reps 5] [--gamma 8]
"""

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def spread(vals):
    return {"n_reps": len(vals), "min": round(float(np.min(vals)), 2),
            "median": round(float(np.median(vals)), 2),
            "max": round(float(np.max(vals)), 2)}


def measure(bd, pd, bt, pt, prompt, gamma, reps):
    from llmspeculativesampling_tpu.engine.autoregressive import (
        autoregressive_generate,
    )
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)
    ar, sp = [], []
    acc = None
    for k in range(1, reps + 2):
        _, dar = autoregressive_generate(
            bt, pt, prompt, 128, key=jax.random.key(k), details=True, **kw)
        if k > 1:
            ar.append(dar["tokens_per_s"])
    for k in range(1, reps + 2):
        _, dsp = speculative_generate(
            bd, pd, bt, pt, prompt, 128, gamma=gamma, key=jax.random.key(k),
            details=True, **kw)
        if k > 1:
            sp.append(dsp["tokens_per_s"])
            acc = dsp["acc_rate"]
    return ar, sp, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--gamma", type=int, default=8)
    args = ap.parse_args()

    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair_int8

    print("device:", jax.devices()[0], file=sys.stderr)
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    out = {"config": "13b-geometry", "gamma": args.gamma}

    bd, pd, bt, pt = synthetic_pair_int8()
    jax.block_until_ready(pt["layers"]["w_down"]["q"])
    ar8, sp8, acc8 = measure(bd, pd, bt, pt, prompt, args.gamma, args.reps)
    out["int8"] = {"ar": spread(ar8), "spec": spread(sp8),
                   "acc_rate": round(acc8, 4)}
    del bd, pd, bt, pt
    gc.collect()

    bd, pd, bt, pt = synthetic_pair_int8(fmt="fp8_e4m3")
    jax.block_until_ready(pt["layers"]["w_down"]["q"])
    arf, spf, accf = measure(bd, pd, bt, pt, prompt, args.gamma, args.reps)
    out["fp8_e4m3"] = {"ar": spread(arf), "spec": spread(spf),
                       "acc_rate": round(accf, 4)}
    out["fp8_vs_int8_ar"] = round(out["fp8_e4m3"]["ar"]["median"]
                                  / out["int8"]["ar"]["median"], 4)
    out["fp8_vs_int8_spec"] = round(out["fp8_e4m3"]["spec"]["median"]
                                    / out["int8"]["spec"]["median"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
