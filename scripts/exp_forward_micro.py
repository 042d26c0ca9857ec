"""Microbench: single forward step time, bf16 vs int8(pallas) vs int8(xla).

Isolates the weight-bandwidth question from sampling/loop overheads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.quant.core import quantize_params
    from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, dist_norm, dist_sample

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_heads=16, num_kv_heads=16, max_position=2048,
        dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.key(1))
    cache0 = __import__("llmspeculativesampling_tpu.cache.kvcache", fromlist=["init_cache"]).init_cache(
        cfg.num_layers, 1, cfg.num_kv_heads, 256, cfg.head_dim, cfg.jnp_dtype)

    def bench(name, p, s_new, iters=50):
        tok = jnp.ones((1, s_new), jnp.int32)

        @jax.jit
        def step(p, tok, c):
            lg, c = llama.forward(p, cfg, tok, c)
            return lg[:, -1], c

        lg, c = step(p, tok, cache0)  # compile+prefill
        jax.block_until_ready(lg)
        t0 = time.perf_counter()
        for _ in range(iters):
            lg, c = step(p, tok, c)
        jax.block_until_ready(lg)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} s_new={s_new}: {dt*1e3:7.3f} ms", flush=True)
        return dt

    def bench_sampling(iters=200):
        scfg = SamplingConfig(1.0, 20, 0.9)
        logits = jax.random.normal(jax.random.key(0), (1, 32000), jnp.float32)

        @jax.jit
        def samp(key, logits):
            d = dist_norm(logits, scfg)
            return dist_sample(key, d)

        k = jax.random.key(1)
        x = samp(k, logits); jax.block_until_ready(x)
        t0 = time.perf_counter()
        for i in range(iters):
            x = samp(jax.random.fold_in(k, i), logits)
        jax.block_until_ready(x)
        print(f"{'norm+sample (sparse topk)':28s}        : {(time.perf_counter()-t0)/iters*1e3:7.3f} ms", flush=True)

    print("device:", jax.devices()[0].device_kind, flush=True)
    bench("bf16 decode fwd", params, 1)
    bench("bf16 verify fwd", params, 5)

    pq = quantize_params(params, "llama", quantize_lm_head=True)
    os.environ["LLMSS_FORCE_PALLAS"] = "1"
    bench("int8-pallas decode fwd", pq, 1)
    bench("int8-pallas verify fwd", pq, 5)
    os.environ["LLMSS_FORCE_PALLAS"] = "0"
    # note: jit cache keys on pytree structure only; env flag is read at
    # trace time -> need a fresh jit. quantize again to change identity? No:
    # force_ref dispatch happens inside linear() at trace time via use_pallas().
    # Different env -> same structure -> cached program reused. Re-jit via clone fn.
    from llmspeculativesampling_tpu.models import llama as llama2

    def fwd_ref(p, c, tok):
        return llama2.forward(p, cfg, tok, c)

    def bench_ref(name, p, s_new, iters=50):
        tok = jnp.ones((1, s_new), jnp.int32)
        step = jax.jit(lambda p, tok, c: fwd_ref(p, c, tok))
        lg, c = step(p, tok, cache0)
        jax.block_until_ready(lg)
        t0 = time.perf_counter()
        for _ in range(iters):
            lg, c = step(p, tok, c)
        jax.block_until_ready(lg)
        print(f"{name:28s} s_new={s_new}: {(time.perf_counter()-t0)/iters*1e3:7.3f} ms", flush=True)

    bench_ref("int8-xla decode fwd", pq, 1)
    bench_ref("int8-xla verify fwd", pq, 5)
    bench_sampling()


if __name__ == "__main__":
    main()
