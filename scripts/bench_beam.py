"""Tree/beam engine benchmark (VERDICT r1 #4): beam / beam_v2 / mjsd /
multi tok/s vs autoregressive and plain speculative, compile-warm,
device-loop timing (same discipline as exp_timing_truth.py: first call
pays compilation and is discarded; best of the following runs is
reported).

Geometries:
  default      1.1B-shaped bf16 pair (hidden 2048, 16 layers, shared-prefix
               2-layer draft) — fast to compile, exposes per-step overheads
  --thirteen_b 13B-geometry int8 target + 68m-scale draft (the reference
               headline pairing, README.md:11)

Prints one JSON line per method plus a summary line.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

MAX_NEW = 64


def bench_method(name, fn, reps=3):
    fn()  # compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out, d = fn()
        wall = time.perf_counter() - t0
        tps = d["tokens_generated"] / wall if wall > 0 else 0.0
        if best is None or tps > best[0]:
            best = (tps, d, wall)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thirteen_b", action="store_true")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--num_beams", type=int, default=4)
    ap.add_argument("--max_new", type=int, default=MAX_NEW)
    ap.add_argument("--methods", default="ar,spec,multi,mjsd,beam,beam_v2,rbeam")
    args = ap.parse_args()

    from llmspeculativesampling_tpu.core.synthetic import (
        synthetic_pair, synthetic_pair_int8_small_draft,
    )
    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.beam_spec import mjsd_generate
    from llmspeculativesampling_tpu.engine.beam_tree import (
        beam_speculative_generate, beam_speculative_v2_generate,
    )
    from llmspeculativesampling_tpu.engine.multi import multi_speculative_generate
    from llmspeculativesampling_tpu.engine.random_beam import random_width_beam_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    if args.thirteen_b:
        bd, pd, bt, pt = synthetic_pair_int8_small_draft()
        geom = "13b_int8"
    else:
        bd, pd, bt, pt = synthetic_pair()
        geom = "1.1b_bf16"

    g, b = args.gamma, args.num_beams
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9,
              details=True)
    key = jax.random.key(3)

    runs = {
        "ar": lambda: autoregressive_generate(
            bt, pt, prompt, args.max_new, key=key, **kw),
        "spec": lambda: speculative_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=g, key=key, **kw),
        "multi": lambda: multi_speculative_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=g, width=b,
            key=key, **kw),
        "mjsd": lambda: mjsd_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=g, width=b,
            num_beams=b, accept_thres=0.1, key=key, **kw),
        "beam": lambda: beam_speculative_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=g, num_beams=b,
            key=key, **kw),
        "beam_v2": lambda: beam_speculative_v2_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=g, num_beams=b,
            extra_sample_cnt=1, expect_thres=0.7, key=key, **kw),
        # target-only beam baseline: the quality class the beam/beam_v2
        # engines compete with (they emit beam-search-quality output; the
        # fair speed comparison is this, not plain spec)
        "rbeam": lambda: random_width_beam_generate(
            bt, pt, prompt, args.max_new, max_num_beams=b, min_num_beams=b,
            key=key, **kw),
    }

    results = {}
    for name in args.methods.split(","):
        name = name.strip()
        t0 = time.perf_counter()
        tps, d, wall = bench_method(name, runs[name])
        results[name] = dict(
            tokens_per_s=round(tps, 2),
            acc_rate=round(d.get("acc_rate") or 0.0, 4),
            mean_acc_len=round(float(np.mean(d["acc_len"])), 3)
            if d.get("acc_len") else None,
            steps=d.get("target_call_times"),
            compile_plus_bench_s=round(time.perf_counter() - t0, 1),
        )
        print(json.dumps({"geom": geom, "method": name, "gamma": g,
                          "num_beams": b, **results[name]}), flush=True)

    ar = results.get("ar", {}).get("tokens_per_s")
    print(json.dumps({
        "metric": f"beam_engines_{geom}",
        "ar_tokens_per_s": ar,
        **{f"{m}_x_vs_ar": round(r["tokens_per_s"] / ar, 3)
           for m, r in results.items() if m != "ar" and ar},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
