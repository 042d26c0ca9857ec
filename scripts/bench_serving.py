"""Continuous-batching serving benchmark on one chip.

Measures aggregate tokens/s and TTFT across concurrent requests for the
slot-based SPMD scheduler (serve/scheduler.py), against sequential
single-stream speculative decoding of the same request set (the
reference's serving model: one request at a time, serving.py:29-38).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--steps_per_sync", type=int, default=4)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--kv_int8", action="store_true",
                    help="int8 KV cache on the target (halves verify KV reads)")
    ap.add_argument("--max_total_len", type=int, default=512)
    ap.add_argument("--flash", choices=["auto", "on", "off"], default="auto",
                    help="flash-decode attention mode for both models")
    ap.add_argument("--config", choices=["1.1b", "13b"], default="1.1b",
                    help="13b: born-int8 Llama-2-13B-shaped target "
                         "(core/synthetic.py); KV budget then forces few slots")
    ap.add_argument("--reps", type=int, default=3,
                    help="replays of the workload; aggregates report "
                         "median + {n_reps,min,max} spread (VERDICT r4 #7 "
                         "— the tunnel swings serving walls like it does "
                         "single-stream reps)")
    args = ap.parse_args()

    import dataclasses

    from bench import build_models
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate
    from llmspeculativesampling_tpu.serve.scheduler import ContinuousBatchingEngine

    print("device:", jax.devices()[0].device_kind, flush=True)
    if args.config == "13b":
        from llmspeculativesampling_tpu.core.synthetic import (
            synthetic_pair_int8_small_draft,
        )
        bd, pd, bt, pt = synthetic_pair_int8_small_draft()
    else:
        bd, pd, bt, pt = build_models(quantize=args.int8)
    if args.kv_int8:
        bt = dataclasses.replace(bt, kv_quant=True)
    if args.flash != "auto":
        bd = dataclasses.replace(bd, cfg=dataclasses.replace(bd.cfg, flash=args.flash))
        bt = dataclasses.replace(bt, cfg=dataclasses.replace(bt.cfg, flash=args.flash))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(100, 31000, args.prompt_len).astype(np.int32)
               for _ in range(args.requests)]

    # ---- continuous batching
    eng = ContinuousBatchingEngine(
        bd, pd, bt, pt, num_slots=args.num_slots, max_total_len=args.max_total_len,
        max_new_cap=args.max_new, gamma=args.gamma, eos_token_id=2,
        temperature=1.0, top_k=20, top_p=0.9,
        steps_per_sync=args.steps_per_sync,
    )
    eng.warmup(prompt_len=args.prompt_len)

    def one_batched_rep(rep):
        ps = (prompts if rep == 0 else
              [np.random.default_rng(1000 + rep).integers(
                  100, 31000, args.prompt_len).astype(np.int32)
               for _ in range(args.requests)])
        t0 = time.perf_counter()
        for p in ps:
            eng.submit(p, args.max_new)
        steps = eng.run_until_idle()
        wall = time.perf_counter() - t0
        comps = [eng.result(r) for r in sorted(eng.completions.keys())]
        comps = [c for c in comps if c]
        toks = sum(c.details["tokens_generated"] for c in comps)
        return dict(steps=steps, wall=wall, tps=toks / wall, toks=toks,
                    comps=comps)

    reps = [one_batched_rep(r) for r in range(max(args.reps, 1))]
    tps_all = sorted(r["tps"] for r in reps)
    med = reps[[r["tps"] for r in reps].index(tps_all[len(tps_all) // 2])]
    toks, wall, steps = med["toks"], med["wall"], med["steps"]
    ttfts = sorted(c.details["ttft_s"] for c in med["comps"])
    lats = sorted(c.details["latency_s"] for c in med["comps"])
    print(f"batched : slots={args.num_slots} reqs={len(med['comps'])} steps={steps} "
          f"tokens={toks} wall={wall:.2f}s -> {toks/wall:.1f} tok/s  "
          f"ttft p50={ttfts[len(ttfts)//2]*1e3:.0f}ms p95={ttfts[int(len(ttfts)*0.95)]*1e3:.0f}ms  "
          f"lat p50={lats[len(lats)//2]:.2f}s  "
          f"[reps={len(reps)} min={tps_all[0]:.1f} "
          f"med={tps_all[len(tps_all)//2]:.1f} max={tps_all[-1]:.1f}]",
          flush=True)

    # ---- sequential single-stream (reference serving model)
    kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)
    _ = speculative_generate(bd, pd, bt, pt, prompts[0], args.max_new,
                             gamma=args.gamma, key=jax.random.key(0), **kw)
    seq_rates = []
    for rep in range(max(args.reps, 1)):
        t0 = time.perf_counter()
        toks_seq = 0
        for i, p in enumerate(prompts):
            out = speculative_generate(bd, pd, bt, pt, p, args.max_new,
                                       gamma=args.gamma, key=jax.random.key(i), **kw)
            toks_seq += len(out) - len(p)
        seq_rates.append(toks_seq / (time.perf_counter() - t0))
    seq_rates.sort()
    seq_med = seq_rates[len(seq_rates) // 2]
    print(f"sequential: -> {seq_med:.1f} tok/s  "
          f"[reps={len(seq_rates)} min={seq_rates[0]:.1f} "
          f"med={seq_med:.1f} max={seq_rates[-1]:.1f}]", flush=True)
    print(f"speedup: {(toks/wall)/seq_med:.2f}x", flush=True)


if __name__ == "__main__":
    main()
