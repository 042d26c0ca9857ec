"""Bisect the autoregressive while_loop cost: forward-only vs +sampling vs
full engine, all as single device programs (one dispatch each).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from llmspeculativesampling_tpu.cache.kvcache import init_cache, rollback
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, dist_norm, dist_sample

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_heads=16, num_kv_heads=16, max_position=2048,
        dtype="bfloat16",
    )
    params = llama.init_params(cfg, jax.random.key(1))
    bundle = ModelBundle("llama", cfg, llama.forward)
    N = 128
    S_MAX = 256

    def make_loop(sample_mode):
        @jax.jit
        def run(params, key):
            cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S_MAX, cfg.head_dim, cfg.jnp_dtype)
            prompt = jnp.ones((1, 64), jnp.int32)
            logits, cache = llama.forward(params, cfg, prompt, cache)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            scfg = SamplingConfig(1.0, 20, 0.9)

            def body(i, carry):
                tok, cache, key, acc = carry
                logits, cache = llama.forward(params, cfg, tok[:, None], cache)
                if sample_mode == "argmax":
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                elif sample_mode == "sample":
                    key, k2 = jax.random.split(key)
                    d = dist_norm(logits[:, -1], scfg)
                    nxt = dist_sample(k2, d)
                else:  # none: data-dep passthrough
                    nxt = (tok + 1) % 32000 + (logits[0, -1, 0] > 1e9).astype(jnp.int32)
                return nxt, cache, key, acc + nxt[0]

            tok, cache, key, acc = jax.lax.fori_loop(0, N, body, (tok, cache, key, jnp.int32(0)))
            return acc

        return run

    for mode in ("none", "argmax", "sample"):
        f = make_loop(mode)
        out = f(params, jax.random.key(0)); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(params, jax.random.key(1)); jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"loop[{mode:6s}]: {dt/N*1e3:7.3f} ms/token", flush=True)

    # the real engine
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    for k in (1, 2):
        _, d = autoregressive_generate(
            bundle, params, prompt, N, key=jax.random.key(k), details=True,
            eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)
    print(f"engine AR     : {1e3/d['tokens_per_s']:7.3f} ms/token", flush=True)


if __name__ == "__main__":
    main()
