"""Paged vs slotted continuous-batching serving at EQUAL KV-HBM budget.

The slotted scheduler (serve/scheduler.py) reserves num_slots x
max_total_len cache positions — every slot pays for the worst-case
request. The paged engine (serve/paged.py) holds one shared pool of
num_blocks x page positions and admits requests byte-accurately. This
bench gives both the SAME total KV positions and drives them with:

  * ``mixed``  — mostly short chat turns plus a few long-context
    requests. The slotted engine must size max_total_len for the long
    ones, so the same HBM buys few slots; the paged pool admits many
    shorts alongside each long request. This is the workload paging
    exists for (vLLM's motivating case).
  * ``uniform`` — identical requests, where slots are optimal; measures
    the paging overhead (block scatter/gather or paged-flash DMA).

Reference point: the reference serves one request at a time with no
cache reuse across requests (serving.py:29-38) and trims per-request HF
tuples (kvcache_model.py:359-436); neither engine exists there.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def _workload(kind: str, rng):
    """List of (prompt_len, max_new). Mixed: 24 short turns + 6 long-context.
    shared_prefix: one hot 512-token system prompt + unique 64-token tails.
    longgen: 24 long GENERATIONS (64-token prompt, 256 new) — the shape
    where on-demand paging's admission-depth win lives (worst-case
    reservation is 2.8x the prompt+runway reserve)."""
    if kind == "shared_prefix":
        return [(576, 48) for _ in range(24)]
    if kind == "longgen":
        return [(64, 256) for _ in range(24)]
    if kind == "mixed":
        short = [(64, int(rng.integers(24, 49))) for _ in range(24)]
        long_ = [(512, 128) for _ in range(6)]
        # interleave: a long request every 4 shorts (arrival order matters
        # for slotted head-of-line blocking)
        out = []
        si, li = 0, 0
        for i in range(len(short) + len(long_)):
            if i % 5 == 4 and li < len(long_):
                out.append(long_[li]); li += 1
            else:
                out.append(short[si]); si += 1
        return out
    return [(64, 48) for _ in range(24)]


def _run(engine, reqs, prompts):
    t0 = time.perf_counter()
    rids = [engine.submit(p, mn) for p, (_, mn) in zip(prompts, reqs)]
    engine.run_until_idle()
    wall = time.perf_counter() - t0
    comps = [engine.result(r) for r in rids]
    comps = [c for c in comps if c is not None]
    toks = sum(c.details["tokens_generated"] for c in comps)
    ttfts = sorted(c.details["ttft_s"] for c in comps)
    lats = sorted(c.details["latency_s"] for c in comps)
    return dict(
        n=len(comps), tokens=toks, wall=wall, tps=toks / wall,
        ttft_p50=ttfts[len(ttfts) // 2], ttft_p95=ttfts[int(len(ttfts) * 0.95)],
        lat_p50=lats[len(lats) // 2],
    )


def _run_reps(engine, reqs, make_prompts, n_reps: int):
    """Median-of-N with spread (VERDICT r4 ask #7): serving aggregates on
    the axon-tunneled chip swing with tunnel stalls just like the
    single-stream bench — one-shot serving numbers are not publishable.
    Each rep drives a fresh prompt set (so prefix-cache runs don't
    contaminate later reps) through the SAME warmed engine."""
    runs = [_run(engine, reqs, make_prompts(rep)) for rep in range(n_reps)]
    tps = sorted(r["tps"] for r in runs)
    med = runs[[r["tps"] for r in runs].index(tps[len(tps) // 2])]
    out = dict(med)
    out.update(n_reps=n_reps, tps_min=tps[0], tps_median=tps[len(tps) // 2],
               tps_max=tps[-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["tiny", "1.1b", "13b"], default="1.1b")
    ap.add_argument("--workload",
                    choices=["mixed", "uniform", "shared_prefix", "longgen"],
                    default="mixed")
    ap.add_argument("--prefix_cache", action="store_true",
                    help="enable automatic prefix caching in the paged engine")
    ap.add_argument("--kv_budget", type=int, default=4096,
                    help="total KV positions given to EACH engine")
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--batch_rows", type=int, default=16,
                    help="paged engine decode rows (concurrency cap)")
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--steps_per_sync", type=int, default=4)
    ap.add_argument("--kv_int8", action="store_true")
    ap.add_argument("--flash", choices=["auto", "on", "off"], default="auto")
    ap.add_argument("--repeat_workload", type=int, default=1,
                    help="replay the workload N times (steady-state runs "
                         "for the adaptive-gamma bandit)")
    ap.add_argument("--adaptive_gamma", default="",
                    help="comma list of gamma choices, e.g. 4,8,16 — the "
                         "engine re-picks from measured throughput")
    ap.add_argument("--adaptive_mode", choices=["epoch", "chunk"],
                    default="epoch",
                    help="arm-switch granularity: 'epoch' = completed-"
                         "request throughput per row-turnover epoch (r4); "
                         "'chunk' = round 3's per-chunk bandit")
    ap.add_argument("--pool_pad", choices=["auto", "on", "off"], default="auto",
                    help="pad sub-128 head_dim pools to 128 so the draft "
                         "rides the native flash lane (VERDICT r2 #6)")
    ap.add_argument("--slotted_slots", type=int, default=0,
                    help="override the equal-budget slot count (e.g. when "
                         "the slotted engine OOMs at parity budget — "
                         "itself a result worth recording)")
    ap.add_argument("--on_demand", choices=["on", "off"], default="on",
                    help="on-demand page allocation + preemption (r5); "
                         "'off' = legacy worst-case reservation")
    ap.add_argument("--overcommit", type=float, default=1.0,
                    help="admission commitment watermark (1.0 = never "
                         "admit beyond sustainable worst case; >1 trades "
                         "preemption churn for TTFT on EOS-heavy traffic)")
    ap.add_argument("--chunked_prefill", action="store_true",
                    help="SARATHI-style staged cold prefill (r5)")
    ap.add_argument("--reps", type=int, default=1,
                    help=">1: replay the workload N times on the warmed "
                         "engine and report median + spread")
    ap.add_argument("--skip_slotted", action="store_true")
    ap.add_argument("--skip_paged", action="store_true")
    ap.add_argument("--subprocess", action="store_true",
                    help="run each engine in its own process (clean HBM; "
                         "default when both engines are requested)")
    args = ap.parse_args()

    if not args.skip_slotted and not args.skip_paged and not args.subprocess:
        # one engine's pools lingering in-process shrink the other's HBM;
        # re-exec per engine and merge the printed results
        import re
        import subprocess

        base = [sys.executable, os.path.abspath(__file__)]
        flags = []
        for k, v in vars(args).items():
            if k in ("skip_slotted", "skip_paged", "subprocess"):
                continue
            if isinstance(v, bool):
                if v:
                    flags.append(f"--{k}")
            else:
                flags += [f"--{k}", str(v)]
        tps = {}
        ttft = {}
        for skip, name in (("--skip_slotted", "paged"), ("--skip_paged", "slotted")):
            out = subprocess.run(base + flags + [skip], capture_output=True, text=True)
            sys.stdout.write(out.stdout)
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-2000:])
                return
            m = re.search(rf"{name}\s*:.*-> ([\d.]+) tok/s.*ttft p50=(\d+)ms",
                          out.stdout)
            if m:
                tps[name] = float(m.group(1))
                ttft[name] = float(m.group(2))
        if len(tps) == 2:
            print(f"paged/slotted throughput: {tps['paged']/tps['slotted']:.2f}x  "
                  f"ttft p50: {ttft['slotted']/max(ttft['paged'],1e-9):.2f}x better",
                  flush=True)
        return

    from bench import build_models
    from llmspeculativesampling_tpu.serve.paged import PagedEngine
    from llmspeculativesampling_tpu.serve.scheduler import ContinuousBatchingEngine

    print("device:", jax.devices()[0].device_kind, flush=True)
    if args.config == "13b":
        from llmspeculativesampling_tpu.core.synthetic import (
            synthetic_pair_int8_small_draft,
        )
        bd, pd, bt, pt = synthetic_pair_int8_small_draft()
    elif args.config == "tiny":  # CPU smoke-test config
        from llmspeculativesampling_tpu.core.config import LlamaConfig
        from llmspeculativesampling_tpu.engine.types import ModelBundle
        from llmspeculativesampling_tpu.models import llama

        cfg_t = LlamaConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, max_position=2048,
            dtype="float32",
        )
        cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
        pt = llama.init_params(cfg_t, jax.random.key(0))
        pd = {
            "embed": pt["embed"], "ln_final": pt["ln_final"],
            "lm_head": pt["lm_head"],
            "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
        }
        bt = ModelBundle("llama", cfg_t, llama.forward)
        bd = ModelBundle("llama", cfg_d, llama.forward)
    else:
        bd, pd, bt, pt = build_models(quantize=True)
    if args.kv_int8:
        bt = dataclasses.replace(bt, kv_quant=True)
    if args.flash != "auto":
        bd = dataclasses.replace(bd, cfg=dataclasses.replace(bd.cfg, flash=args.flash))
        bt = dataclasses.replace(bt, cfg=dataclasses.replace(bt.cfg, flash=args.flash))

    rng = np.random.default_rng(0)
    reqs = _workload(args.workload, rng) * max(args.repeat_workload, 1)
    if args.workload == "shared_prefix":
        system = rng.integers(100, 31000, 512).astype(np.int32)
        prompts = [np.concatenate([system, rng.integers(100, 31000, pl - 512)
                                   .astype(np.int32)]) for pl, _ in reqs]
    else:
        prompts = [rng.integers(100, 31000, pl).astype(np.int32) for pl, _ in reqs]
    gam_sizing = args.gamma
    if args.adaptive_gamma:
        gam_sizing = max([args.gamma] + [int(x) for x in args.adaptive_gamma.split(",")])
    worst = max(pl + mn for pl, mn in reqs) + gam_sizing + 1
    max_total_len = -(-worst // 128) * 128
    num_slots = args.slotted_slots or max(1, args.kv_budget // max_total_len)
    num_blocks = args.kv_budget // args.page
    max_pages = -(-worst // args.page)
    print(f"workload={args.workload} reqs={len(reqs)} worst={worst} | "
          f"slotted: {num_slots} x {max_total_len} = {num_slots*max_total_len} pos | "
          f"paged: {num_blocks} x {args.page} = {num_blocks*args.page} pos, "
          f"rows={args.batch_rows}", flush=True)

    eng_kw = dict(gamma=args.gamma, eos_token_id=2, temperature=1.0, top_k=20,
                  top_p=0.9, steps_per_sync=args.steps_per_sync)

    results = {}
    if not args.skip_paged:
        pool_pad = {"auto": None, "on": True, "off": False}[args.pool_pad]
        agam = (tuple(int(x) for x in args.adaptive_gamma.split(","))
                if args.adaptive_gamma else None)
        paged = PagedEngine(
            bd, pd, bt, pt, batch_rows=args.batch_rows, num_blocks=num_blocks,
            page=args.page, max_pages_per_req=max_pages,
            max_new_cap=max(mn for _, mn in reqs), prompt_bucket=64,
            kv_quant=args.kv_int8, prefix_cache=args.prefix_cache,
            pool_pad_128=pool_pad, adaptive_gamma=agam,
            adaptive_gamma_mode=args.adaptive_mode,
            on_demand=args.on_demand == "on", overcommit=args.overcommit,
            chunked_prefill=args.chunked_prefill, **eng_kw,
        )
        print(f"paged pools: draft D={paged.state.draft_cache.k.shape[-1] if hasattr(paged.state.draft_cache, 'k') else paged.state.draft_cache.k_q.shape[-1]}, "
              f"target D={paged.state.target_cache.k.shape[-1] if hasattr(paged.state.target_cache, 'k') else paged.state.target_cache.k_q.shape[-1]}", flush=True)
        paged.warmup(prompt_lens=sorted({pl for pl, _ in reqs}))

        def mk_prompts(rep):
            if rep == 0:
                return prompts
            rr = np.random.default_rng(1000 + rep)
            if args.workload == "shared_prefix":
                return [np.concatenate([system, rr.integers(100, 31000, pl - 512)
                                        .astype(np.int32)]) for pl, _ in reqs]
            return [rr.integers(100, 31000, pl).astype(np.int32)
                    for pl, _ in reqs]

        r = (_run_reps(paged, reqs, mk_prompts, args.reps)
             if args.reps > 1 else _run(paged, reqs, prompts))
        if agam:
            st = paged.adaptive_stats()
            print(f"adaptive gamma settled on {st['incumbent']} "
                  f"(mode={st['mode']}, acc EMA {paged._acc_ema:.3f}, "
                  f"epochs={st['epochs']}, "
                  f"epoch_rates={ {g: round(r, 1) for g, r in st['epoch_rates'].items()} })",
                  flush=True)
            for h in st.get("epoch_history", []):
                print(f"  epoch {h['phase']:>7} g={h['gamma']:<2} "
                      f"compl={h['completions']:<3} wall={h['wall_s']:.2f}s "
                      f"-> {h['tok_per_s']} tok/s", flush=True)
        results["paged"] = r
        pc = (f"  prefix hits={paged.allocator.hits}p"
              if args.prefix_cache else "")
        if args.reps > 1:
            pc += (f"  [reps={r['n_reps']} min={r['tps_min']:.1f} "
                   f"med={r['tps_median']:.1f} max={r['tps_max']:.1f}]")
        if paged.preemptions:
            pc += f"  preemptions={paged.preemptions}"
        if args.chunked_prefill:
            pc += f"  interleaved_chunks={paged.interleaved_chunks}"
        print(f"paged   : reqs={r['n']} tokens={r['tokens']} wall={r['wall']:.2f}s "
              f"-> {r['tps']:.1f} tok/s  ttft p50={r['ttft_p50']*1e3:.0f}ms "
              f"p95={r['ttft_p95']*1e3:.0f}ms  lat p50={r['lat_p50']:.2f}s{pc}",
              flush=True)
        del paged

    if not args.skip_slotted:
        slotted = ContinuousBatchingEngine(
            bd, pd, bt, pt, num_slots=num_slots, max_total_len=max_total_len,
            max_new_cap=max(mn for _, mn in reqs), **eng_kw,
        )
        for pl in sorted({pl for pl, _ in reqs}):
            slotted.warmup(prompt_len=pl)

        def mk_prompts_s(rep):
            if rep == 0:
                return prompts
            rr = np.random.default_rng(1000 + rep)
            return [rr.integers(100, 31000, pl).astype(np.int32)
                    for pl, _ in reqs]

        r = (_run_reps(slotted, reqs, mk_prompts_s, args.reps)
             if args.reps > 1 else _run(slotted, reqs, prompts))
        results["slotted"] = r
        sp = ""
        if args.reps > 1:
            sp = (f"  [reps={r['n_reps']} min={r['tps_min']:.1f} "
                  f"med={r['tps_median']:.1f} max={r['tps_max']:.1f}]")
        print(f"slotted : reqs={r['n']} tokens={r['tokens']} wall={r['wall']:.2f}s "
              f"-> {r['tps']:.1f} tok/s  ttft p50={r['ttft_p50']*1e3:.0f}ms "
              f"p95={r['ttft_p95']*1e3:.0f}ms  lat p50={r['lat_p50']:.2f}s{sp}", flush=True)

    if "paged" in results and "slotted" in results:
        print(f"paged/slotted throughput: "
              f"{results['paged']['tps']/results['slotted']['tps']:.2f}x  "
              f"ttft p50: {results['slotted']['ttft_p50']/max(results['paged']['ttft_p50'],1e-9):.2f}x better",
              flush=True)


if __name__ == "__main__":
    main()
