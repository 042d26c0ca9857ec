"""Round benchmark: speculative vs autoregressive decoding on one TPU chip.

Prints ONE JSON line:
  {"metric": "spec_decode_tokens_per_s", "value": N, "unit": "tok/s",
   "vs_baseline": speedup_over_autoregressive, ...extras}

``value`` is the MEDIAN of N_REPS timed runs; ``spec_spread``/``ar_spread``
carry {n_reps, min, median, max} and ``dispatch_rtt_ms`` a before/after
tunnel-RTT probe, so a reader can distinguish tunnel load from a real
regression (VERDICT r3 weak #2: best-of-N medians swung 12% across rounds
with no spread or load marker in the emitted JSON).

Setup mirrors the reference's headline config shape (draft + big target,
top_k=20, top_p=0.9, 128 new tokens — README.md:9 / evaluation.py:254-257)
at the north-star precision (INT8 weight-only target, BASELINE.md): the
target's layers beyond the draft depth are damped so the draft is a genuine
approximation of the target (acceptance ~0.93, like a trained 68m/13B
pair). No checkpoints are downloadable in this environment (zero egress),
so weights are random but the compute/memory profile is real. gamma is the
measured-optimal 8 for this acceptance rate (scripts/exp_int8_dispatch.py).

vs_baseline = speculative vs autoregressive decoding of the SAME int8
target on the same chip (the reference's headline ratio,
evaluation.py:421-481 vs :515-594).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

N_REPS = 5       # timed reps per method; headline = median (VERDICT r3 #4:
                 # single best-of numbers hid a 12% cross-round spread)

GAMMA = 8        # measured-optimal for the 1.1b fallback pair
GAMMA_13B = 24   # measured-optimal at 13B: the 68m-scale draft is nearly
                 # free next to the 13 GB verify read, so speculation pays
                 # until acceptance^gamma tails off (median-of-6 sweep)
MAX_NEW = 128


def build_models(quantize: bool):
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.quant.core import quantize_params

    # ~1.1B-param-shaped target; draft = its first 2 layers (68m-ish cost)
    cfg_t = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_heads=16, num_kv_heads=16, max_position=2048,
        dtype="bfloat16",
    )
    bt = ModelBundle("llama", cfg_t, llama.forward)
    pt = llama.init_params(cfg_t, jax.random.key(1))
    eps = 0.02  # damp layers >=2 so draft approximates target (acc ~0.93)
    damp = jnp.concatenate(
        [jnp.ones(2), jnp.full((cfg_t.num_layers - 2,), eps)]
    ).astype(cfg_t.jnp_dtype)
    pt["layers"]["wo"] = pt["layers"]["wo"] * damp[:, None, None]
    pt["layers"]["w_down"] = pt["layers"]["w_down"] * damp[:, None, None]

    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 2})
    bd = ModelBundle("llama", cfg_d, llama.forward)
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"], "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:2], pt["layers"]),
    }
    if quantize:
        pt = quantize_params(pt, "llama", quantize_lm_head=True)
        pd = quantize_params(pd, "llama", quantize_lm_head=True)
    return bd, pd, bt, pt


def acceptance_sweep(ar_best, prompt, gen_kw, make_pair):
    """Acceptance-sensitivity sweep (round-1 verdict #5): the headline's
    0.88 acceptance comes from the synthetic pair's ``damp`` knob; a real
    trained 68m/13B pair sits nearer 0.6-0.8 where acceptance^gamma decays
    faster and the optimal gamma (and speedup) drop. Re-generate the pair
    at several damps (same shapes -> jit cache hits; old params freed
    first so the 13 GB target never exists twice) and report the measured
    acceptance, best gamma, and tok/s at each."""
    import gc

    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    rows = []
    # measured damp -> acceptance map (TPU, gamma=8): 0.008->0.90,
    # 0.012->0.81, 0.018->0.72, 0.025->0.60, 0.035->0.50; acceptance
    # falls off a cliff beyond (0.05->0.39, 0.12->0.08), so sample the
    # realistic 0.5-0.9 band, with 0.018 as the ~0.72 "trained pair" point
    for damp in (0.008, 0.018, 0.035):
        pair = make_pair(damp)
        bd, pd, bt, pt = pair
        best = None
        for gamma in (8, 16, 24):
            d_last = None
            for k in (1, 2):  # k=1 pays any compile; k=2 is timed
                _, d_last = speculative_generate(
                    bd, pd, bt, pt, prompt, MAX_NEW, gamma=gamma,
                    key=jax.random.key(k), details=True, **gen_kw)
            if best is None or d_last["tokens_per_s"] > best[1]["tokens_per_s"]:
                best = (gamma, d_last)
        gamma, d = best
        rows.append({
            "damp": damp,
            "acc_rate": round(d["acc_rate"], 4),
            "best_gamma": gamma,
            "tokens_per_s": round(d["tokens_per_s"], 2),
            "vs_ar": round(d["tokens_per_s"] / ar_best, 3) if ar_best else None,
        })
        del pair, bd, pd, bt, pt
        gc.collect()
    return rows


def dispatch_rtt_ms(n: int = 8) -> float:
    """Tunnel-load sentinel: median wall of a trivial dispatch+fetch. The
    chip sits behind a remote tunnel whose RTT varies with shared load
    (docs/PERFORMANCE.md methodology); quoting it beside the throughput
    numbers lets a reader tell a tunnel-slow run from a regression."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.int32)
    x = f(x)  # compile outside the timed reps
    _ = int(x)
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = int(f(x))  # one dispatch + one scalar fetch
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls) * 1e3)


def _spread(vals):
    return {
        "n_reps": len(vals),
        "min": round(float(np.min(vals)), 2),
        "median": round(float(np.median(vals)), 2),
        "max": round(float(np.max(vals)), 2),
    }


def main():
    import sys

    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    # Headline config: Llama-2-13B-shaped int8 target + independent
    # 68m-scale draft (the reference's headline pairing, README.md:11) on
    # the single chip — ~13.2 GB born-int8 weights (core/synthetic.py).
    # Falls back to the 1.1B-shaped pair if the big allocation fails
    # (e.g. shared/partial chip).
    config = "13b-int8"
    try:
        from llmspeculativesampling_tpu.core.synthetic import (
            synthetic_pair_int8_small_draft,
        )
        bd, pd, bt, pt = synthetic_pair_int8_small_draft()
        jax.block_until_ready(pt["layers"]["w_down"]["q"])
    except Exception as e:  # noqa: BLE001 — any OOM/backend failure
        print(f"13b config unavailable ({type(e).__name__}); 1.1b fallback",
              file=sys.stderr)
        config = "1.1b-int8"
        bd, pd, bt, pt = build_models(quantize=True)
    gamma = GAMMA_13B if config == "13b-int8" else GAMMA
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    gen_kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)

    rtt_before = dispatch_rtt_ms()

    # warm up (compile, k=1 untimed), then N_REPS timed runs each;
    # headline = MEDIAN with {n_reps, min, max} spread (VERDICT r3 #4)
    ar_rates = []
    for k in range(1, N_REPS + 2):
        _, dar = autoregressive_generate(
            bt, pt, prompt, MAX_NEW, key=jax.random.key(k), details=True, **gen_kw)
        if k > 1:
            ar_rates.append(dar["tokens_per_s"])
    ar_best = float(np.median(ar_rates))

    sp_rates, details_by_rate = [], {}
    for k in range(1, N_REPS + 2):
        _, dsp = speculative_generate(
            bd, pd, bt, pt, prompt, MAX_NEW, gamma=gamma,
            key=jax.random.key(k), details=True, **gen_kw)
        if k > 1:
            sp_rates.append(dsp["tokens_per_s"])
            details_by_rate[dsp["tokens_per_s"]] = dsp
    sp_best = float(np.median(sp_rates))
    # details of the rep closest to the median rate
    d_best = details_by_rate[min(details_by_rate, key=lambda r: abs(r - sp_best))]

    # acceptance-sensitivity sweep (13B config only; skipped on fallback
    # where the shared-prefix pair's damp has a different meaning)
    acc_sweep = []
    realistic = None
    if config == "13b-int8":
        import gc

        from llmspeculativesampling_tpu.core.synthetic import (
            synthetic_pair_int8_small_draft,
        )

        del bd, pd, bt, pt
        gc.collect()
        acc_sweep = acceptance_sweep(
            ar_best, prompt, gen_kw,
            lambda damp: synthetic_pair_int8_small_draft(damp=damp))
        # "realistic" = the sweep point closest to a trained pair's ~0.75
        if acc_sweep:
            realistic = min(acc_sweep, key=lambda r: abs(r["acc_rate"] - 0.75))

    print(json.dumps({
        "metric": "spec_decode_tokens_per_s",
        "value": round(sp_best, 2),
        "unit": "tok/s",
        "vs_baseline": round(sp_best / ar_best, 3),
        "ar_tokens_per_s": round(ar_best, 2),
        "spec_spread": _spread(sp_rates),
        "ar_spread": _spread(ar_rates),
        "dispatch_rtt_ms": {
            "before": round(rtt_before, 1),
            "after": round(dispatch_rtt_ms(), 1),
        },
        "acc_rate": round(d_best["acc_rate"], 4),
        "mean_acc_len": round(float(np.mean(d_best["acc_len"])), 3),
        "gamma": gamma,
        "weights": "int8",
        "config": config,
        "acc_sweep": acc_sweep,
        "realistic": realistic,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
