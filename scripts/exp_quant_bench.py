"""Scratch experiment: int8 vs bf16 target, gamma sweep, pallas on/off.

Measures the bench.py config (1.1B-shaped target, 2-layer draft) on the
real chip. Not part of the library; informs bench.py defaults.

Usage: python scripts/exp_quant_bench.py [--pallas 0|1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def build_models(quantize: bool):
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.quant.core import quantize_params

    cfg_t = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_heads=16, num_kv_heads=16, max_position=2048,
        dtype="bfloat16",
    )
    bt = ModelBundle("llama", cfg_t, llama.forward)
    pt = llama.init_params(cfg_t, jax.random.key(1))
    eps = 0.02
    damp = jnp.concatenate([jnp.ones(2), jnp.full((cfg_t.num_layers - 2,), eps)]).astype(cfg_t.jnp_dtype)
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


def run(quantize: bool, gammas):
    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    bd, pd, bt, pt = build_models(quantize)
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    gen_kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)
    tag = "int8" if quantize else "bf16"

    ar_best = 0.0
    for k in (1, 2, 3):
        _, dar = autoregressive_generate(bt, pt, prompt, 128, key=jax.random.key(k), details=True, **gen_kw)
        if k > 1:
            ar_best = max(ar_best, dar["tokens_per_s"])
    print(f"[{tag}] AR: {ar_best:.1f} tok/s", flush=True)

    for g in gammas:
        best, acc = 0.0, 0.0
        for k in (1, 2, 3):
            _, d = speculative_generate(
                bd, pd, bt, pt, prompt, 128, gamma=g, key=jax.random.key(k), details=True, **gen_kw)
            if k > 1:
                if d["tokens_per_s"] > best:
                    best, acc = d["tokens_per_s"], d["acc_rate"]
        print(f"[{tag}] spec gamma={g}: {best:.1f} tok/s (acc={acc:.3f}, {best/ar_best:.2f}x)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", default=None)
    ap.add_argument("--modes", default="bf16,int8")
    ap.add_argument("--gammas", default="4,6,8")
    a = ap.parse_args()
    if a.pallas is not None:
        os.environ["LLMSS_FORCE_PALLAS"] = a.pallas
    gammas = [int(x) for x in a.gammas.split(",")]
    print("device:", jax.devices()[0].device_kind, "pallas:", os.environ.get("LLMSS_FORCE_PALLAS", "auto"))
    for mode in a.modes.split(","):
        run(mode == "int8", gammas)
