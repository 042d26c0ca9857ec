"""Inter-token latency jitter across cold admissions: monolithic vs
SARATHI-style chunked prefill (VERDICT r4 ask #5).

A running decode row experiences one chunk-gap per committed burst; a
cold 512-token 13B prefill dispatched between chunks stalls every
running row for the whole prefill wall (visible as the OPT serving TTFT
p50 of ~1.0 s and as a p95 inter-token spike). With
``chunked_prefill=True`` the cold prompt PIGGYBACKS on the decode
chunks' own verify passes (gamma prompt tokens per step, zero extra
target-weight reads; only the cheap draft is prefilled up front), so
running rows never see a monolithic prompt forward at all.

Methodology: closed-loop workload (a completion admits the next
request; every 5th arrival is a long cold prompt), instrumented engine
records every chunk-consume gap tagged with whether an admission
dispatch (prefill or staged window) happened since the last consume.
Both configs run in ONE process back-to-back (tunnel day-parts differ
±20%; memory: axon-timing-methodology). step()-loop (non-pipelined) on
both sides for a fair A/B.

Usage: python scripts/bench_chunked_prefill.py [--config 13b]
       [--n_requests 48] [--extend_chunk 64]
"""

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def build_instrumented():
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    class Instrumented(PagedEngine):
        def reset_instr(self):
            self.gaps = []          # (gap_s, admission_happened)
            self._mark = False
            self._t_last = None

        def _dispatch_prefill(self, *a, **kw):
            self._mark = True
            return super()._dispatch_prefill(*a, **kw)

        def _extend_window(self, *a, **kw):
            self._mark = True
            return super()._extend_window(*a, **kw)

        def _meta_np(self, pack):
            now = time.perf_counter()
            if getattr(self, "_t_last", None) is not None and hasattr(self, "gaps"):
                self.gaps.append((now - self._t_last, self._mark))
            self._t_last = now
            self._mark = False
            return super()._meta_np(pack)

    return Instrumented


def pct(xs, q):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    return xs[min(int(len(xs) * q / 100), len(xs) - 1)]


def run_config(Instrumented, bd, pd, bt, pt, args, chunked: bool):
    rng = np.random.default_rng(0)
    schedule = []
    for i in range(args.n_requests):
        if i % 5 == 4:
            schedule.append((args.long_prompt, 32))
        else:
            schedule.append((64, 48))
    prompts = [rng.integers(100, 31000, pl).astype(np.int32)
               for pl, _ in schedule]
    worst = max(pl + mn for pl, mn in schedule) + args.gamma + 1
    eng = Instrumented(
        bd, pd, bt, pt, batch_rows=args.batch_rows,
        num_blocks=args.kv_budget // args.page, page=args.page,
        max_pages_per_req=-(-worst // args.page),
        max_new_cap=64, gamma=args.gamma, eos_token_id=2, top_k=20,
        top_p=0.9, prompt_bucket=64, steps_per_sync=args.steps_per_sync,
        kv_quant=args.kv_int8, extend_chunk=args.extend_chunk,
        chunked_prefill=chunked, overcommit=args.overcommit,
        prefill_extra=(args.prefill_extra if chunked else 0),
    )
    eng.warmup(prompt_lens=sorted({pl for pl, _ in schedule}))
    eng.reset_instr()
    sched = collections.deque(zip(prompts, schedule))
    rids = []
    t0 = time.perf_counter()
    # closed loop: keep ~batch_rows requests in flight
    for _ in range(min(args.batch_rows + 2, len(sched))):
        p, (_pl, mn) = sched.popleft()
        rids.append(eng.submit(p, mn))
    guard = 0
    while (eng.num_active or eng._pending or sched) and guard < 100_000:
        guard += 1
        eng.step()
        # closed loop: top the in-flight population back up as rows free
        while sched and (len(rids) - len(eng.completions)) < args.batch_rows + 2:
            p, (_pl, mn) = sched.popleft()
            rids.append(eng.submit(p, mn))
    wall = time.perf_counter() - t0
    # pair completions with their schedule entry BEFORE None-filtering —
    # a filtered zip would misattribute every row after a missing one
    paired = [(eng.result(r), schedule[i]) for i, r in enumerate(rids)]
    comps = [c for c, _ in paired if c is not None]
    toks = sum(c.details["tokens_generated"] for c in comps)
    long_ttfts = [c.details["ttft_s"] for c, (pl, _) in paired
                  if c is not None and pl == args.long_prompt]
    steady = [g for g, adm in eng.gaps if not adm]
    admission = [g for g, adm in eng.gaps if adm]
    res = dict(
        chunked=chunked, n=len(comps), tokens=toks, wall=round(wall, 2),
        tps=round(toks / wall, 1),
        steady_gap_p50_ms=round(pct(steady, 50) * 1e3, 1),
        steady_gap_p95_ms=round(pct(steady, 95) * 1e3, 1),
        admission_gap_p50_ms=round(pct(admission, 50) * 1e3, 1),
        admission_gap_p95_ms=round(pct(admission, 95) * 1e3, 1),
        admission_gap_max_ms=round(max(admission) * 1e3, 1) if admission else None,
        long_ttft_p50_s=round(pct(long_ttfts, 50), 3) if long_ttfts else None,
        interleaved_chunks=eng.interleaved_chunks,
        preemptions=eng.preemptions,
    )
    del eng
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["tiny", "13b"], default="13b")
    ap.add_argument("--n_requests", type=int, default=48)
    ap.add_argument("--long_prompt", type=int, default=512)
    ap.add_argument("--batch_rows", type=int, default=16)
    ap.add_argument("--kv_budget", type=int, default=16384)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--steps_per_sync", type=int, default=4)
    ap.add_argument("--extend_chunk", type=int, default=64)
    ap.add_argument("--kv_int8", action="store_true")
    ap.add_argument("--overcommit", type=float, default=1.0)
    ap.add_argument("--prefill_extra", type=int, default=0,
                    help="extra verify-window tokens: piggyback advances "
                         "gamma+extra prompt tokens per step")
    args = ap.parse_args()

    print("device:", jax.devices()[0].device_kind, flush=True)
    if args.config == "13b":
        from llmspeculativesampling_tpu.core.synthetic import (
            synthetic_pair_int8_small_draft,
        )
        bd, pd, bt, pt = synthetic_pair_int8_small_draft()
    else:
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

    Instrumented = build_instrumented()
    import json

    for chunked in (False, True):
        res = run_config(Instrumented, bd, pd, bt, pt, args, chunked)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
