"""OPT-13B-geometry bench: AR / speculative / paged serving on one chip.

The reference's second headline pairing is opt-125m + opt-13b
(/root/reference/README.md:11). This measures our OPT family at that
target geometry (int8, ~13.2 GB on one v5e chip) with the shared-prefix
2-layer draft (full hidden width — HEAVIER per draft token than a true
125m, so the spec numbers are a lower bound for the real pairing; see
core/synthetic.py::synthetic_opt_pair_int8).

    python scripts/bench_opt13b.py [--max_new 256] [--serve_requests 12]
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
    ap.add_argument("--max_new", type=int, default=256)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--serve_requests", type=int, default=12)
    ap.add_argument("--skip_serving", action="store_true")
    args = ap.parse_args()

    from llmspeculativesampling_tpu.core.synthetic import synthetic_opt_pair_int8
    import llmspeculativesampling_tpu as L

    print("device:", jax.devices()[0].device_kind, flush=True)
    bd, pd, bt, pt = synthetic_opt_pair_int8()
    rng = np.random.default_rng(0)
    prompt = rng.integers(100, 50000, 64).astype(np.int32)
    kw = dict(eos_token_id=2, top_k=20, top_p=0.9, details=True)

    # bench.py methodology: warm (compile) run, then best-of-3 to shed
    # tunnel jitter (docs/PERFORMANCE.md methodology; single runs on the
    # axon tunnel under-report by up to ~2x)
    ar_tps = 0.0
    for k in (0, 1, 2, 3):
        _, d = L.autoregressive_generate(
            bt, pt, prompt, args.max_new, key=jax.random.key(k), **kw)
        if k > 0:
            ar_tps = max(ar_tps, d["tokens_per_s"])
    print(f"AR (target-only int8): {ar_tps:.1f} tok/s "
          f"({1e3 / ar_tps:.2f} ms/token)", flush=True)

    sp_best, d_best = 0.0, None
    for k in (0, 1, 2, 3):
        _, d = L.speculative_generate(
            bd, pd, bt, pt, prompt, args.max_new, gamma=args.gamma,
            key=jax.random.key(k), **kw)
        if k > 0 and d["tokens_per_s"] > sp_best:
            sp_best, d_best = d["tokens_per_s"], d
    d = d_best
    print(f"spec gamma={args.gamma}: {sp_best:.1f} tok/s "
          f"({sp_best / ar_tps:.2f}x AR), "
          f"acc_rate {d['acc_rate']:.2f}, "
          f"mean acc_len {np.mean(d['acc_len']):.2f}", flush=True)

    if args.skip_serving:
        return
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    eng = PagedEngine(
        bd, pd, bt, pt, batch_rows=8, num_blocks=32, page=128,
        max_pages_per_req=4, max_new_cap=128, gamma=args.gamma,
        eos_token_id=2, top_k=20, top_p=0.9, prompt_bucket=64,
        kv_quant=True, steps_per_sync=4,
    )
    eng.warmup(prompt_lens=(64,))
    reqs = [rng.integers(100, 50000, 64).astype(np.int32)
            for _ in range(args.serve_requests)]
    t0 = time.perf_counter()
    rids = [eng.submit(p, 96) for p in reqs]
    eng.run_until_idle()
    wall = time.perf_counter() - t0
    toks = ttfts = 0
    for rid in rids:
        c = eng.result(rid)
        toks += c.details["tokens_generated"]
        ttfts += c.details["ttft_s"]
    print(f"paged serving (8 rows, int8 pool): {toks / wall:.1f} tok/s "
          f"aggregate, ttft mean {ttfts / len(rids) * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
