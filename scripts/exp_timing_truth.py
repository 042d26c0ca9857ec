"""Establish trustworthy timing on the axon tunnel: block_until_ready vs
device_get, and scaling with N (tokens) and L (layers)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, dist_norm, dist_sample

scfg = SamplingConfig(1.0, 20, 0.9)


def make_run(cfg, n):
    @jax.jit
    def run(params, prompt, key):
        cache = ModelBundle("llama", cfg, llama.forward).make_cache(1, 64 + n)
        logits, cache = llama.forward(params, cfg, prompt, cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        def body(i, carry):
            tok, cache, key, acc = carry
            logits, cache = llama.forward(params, cfg, tok[:, None], cache)
            key, ks = jax.random.split(key)
            t = dist_sample(ks, dist_norm(logits[:, -1], scfg))
            return t, cache, key, acc + t[0]

        tok, cache, key, acc = jax.lax.fori_loop(0, n, body, (tok, cache, key, jnp.int32(0)))
        return acc

    return run


def main():
    for nl in (4, 16):
        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=8192,
            num_layers=nl, num_heads=16, num_kv_heads=16, max_position=2048,
            dtype="bfloat16",
        )
        params = llama.init_params(cfg, jax.random.key(1))
        prompt = jnp.asarray(np.random.default_rng(0).integers(100, 31000, (1, 64)), jnp.int32)
        for n in (32, 128):
            f = make_run(cfg, n)
            acc = f(params, prompt, jax.random.key(0))
            _ = int(acc)  # force data
            # (a) block_until_ready
            t0 = time.perf_counter()
            acc = f(params, prompt, jax.random.key(7))
            jax.block_until_ready(acc)
            t_block = time.perf_counter() - t0
            # (b) fetch value
            t0 = time.perf_counter()
            acc = f(params, prompt, jax.random.key(8))
            val = int(acc)
            t_fetch = time.perf_counter() - t0
            print(f"L={nl:2d} N={n:4d}: block={t_block*1e3:8.2f} ms  fetch={t_fetch*1e3:8.2f} ms"
                  f"  ({t_fetch/n*1e3:7.1f} us/token)  acc={val}", flush=True)


if __name__ == "__main__":
    main()
