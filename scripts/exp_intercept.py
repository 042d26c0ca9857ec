"""Decompose the fixed per-token cost: lm_head layouts, sampling, vocab
scaling — all chained device loops with scalar fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, dist_norm, dist_sample
from llmspeculativesampling_tpu.quant.core import quantize_params, quantize_tensor

H, V = 2048, 32000
scfg = SamplingConfig(1.0, 20, 0.9)


def chain(op, x, n=300):
    @jax.jit
    def run(x, key):
        def body(j, carry):
            x, acc, key = carry
            key, ks = jax.random.split(key)
            r = op(x + acc * 1e-9, ks)
            return x, jnp.sum(r.astype(jnp.float32)), key
        _, acc, _ = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0), key))
        return acc
    a = run(x, jax.random.key(0)); float(a)
    t0 = time.perf_counter()
    a = run(x, jax.random.key(1)); float(a)
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    x = jax.random.normal(jax.random.key(0), (1, H), jnp.bfloat16)
    w_vh = (jax.random.normal(jax.random.key(1), (V, H), jnp.float32) * 0.02).astype(jnp.bfloat16)
    w_hv_q = quantize_tensor(np.asarray(w_vh.astype(jnp.float32)).T)

    t = chain(lambda x, k: jnp.einsum("bh,vh->bv", x, w_vh, preferred_element_type=jnp.float32), x)
    print(f"lm_head bf16 [V,H] einsum : {t*1e6:8.1f} us", flush=True)
    w_hv = jnp.asarray(np.asarray(w_vh.astype(jnp.float32)).T, jnp.bfloat16)
    t = chain(lambda x, k: jnp.dot(x, w_hv, preferred_element_type=jnp.float32), x)
    print(f"lm_head bf16 [H,V] dot    : {t*1e6:8.1f} us", flush=True)
    t = chain(lambda x, k: jnp.dot(x, w_hv_q["q"].astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32) * w_hv_q["s"][None, :], x)
    print(f"lm_head int8 [H,V] dot    : {t*1e6:8.1f} us", flush=True)

    logits = jax.random.normal(jax.random.key(2), (1, V), jnp.float32)
    t = chain(lambda lg, k: dist_sample(k, dist_norm(lg, scfg)).astype(jnp.float32), logits)
    print(f"dist_norm+sample sparse   : {t*1e6:8.1f} us", flush=True)
    t = chain(lambda lg, k: jax.lax.top_k(lg, 20)[0], logits)
    print(f"lax.top_k 20              : {t*1e6:8.1f} us", flush=True)
    t = chain(lambda lg, k: jax.random.uniform(k, (1,)), logits)
    print(f"key->uniform only         : {t*1e6:8.1f} us", flush=True)

    # full single decode step L=4 at two vocabs to cross-check
    for vocab in (32000, 4000):
        cfg = LlamaConfig(
            vocab_size=vocab, hidden_size=H, intermediate_size=8192,
            num_layers=4, num_heads=16, num_kv_heads=16, max_position=2048,
            dtype="bfloat16",
        )
        p = quantize_params(llama.init_params(cfg, jax.random.key(1)), "llama",
                            quantize_lm_head=True)
        from llmspeculativesampling_tpu.engine.types import ModelBundle

        n = 128

        @jax.jit
        def run(p, prompt, key):
            cache = ModelBundle("llama", cfg, llama.forward).make_cache(1, 64 + n)
            lg, cache = llama.forward(p, cfg, prompt, cache)
            tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)

            def body(i, carry):
                tok, cache, key, acc = carry
                lg, cache = llama.forward(p, cfg, tok[:, None], cache)
                key, ks = jax.random.split(key)
                t = dist_sample(ks, dist_norm(lg[:, -1], scfg))
                return t, cache, key, acc + t[0]

            _, _, _, acc = jax.lax.fori_loop(0, n, body, (tok, cache, key, jnp.int32(0)))
            return acc

        prompt = jnp.asarray(np.random.default_rng(0).integers(100, min(vocab, 31000) - 1, (1, 64)), jnp.int32)
        a = run(p, prompt, jax.random.key(0)); int(a)
        t0 = time.perf_counter()
        a = run(p, prompt, jax.random.key(3)); int(a)
        print(f"AR int8 L=4 V={vocab:6d}     : {(time.perf_counter()-t0)/n*1e3:7.3f} ms/token", flush=True)


if __name__ == "__main__":
    main()
