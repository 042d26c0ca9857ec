"""Where do int8 decode cycles go? (a) per-layer vs fixed cost via L sweep;
(b) packed qkv / gate-up matmuls vs separate, measured inside a chained
device loop (trustworthy: scalar fetch at end)."""

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

scfg = SamplingConfig(1.0, 20, 0.9)
N = 128


def ar_loop_time(cfg, params, n=N):
    @jax.jit
    def run(params, prompt, key):
        from llmspeculativesampling_tpu.engine.types import ModelBundle

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

    prompt = jnp.asarray(np.random.default_rng(0).integers(100, 31000, (1, 64)), jnp.int32)
    acc = run(params, prompt, jax.random.key(0)); int(acc)
    t0 = time.perf_counter()
    acc = run(params, prompt, jax.random.key(7)); int(acc)
    return (time.perf_counter() - t0) / n


def part_a():
    for nl in (4, 8, 16):
        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=8192,
            num_layers=nl, num_heads=16, num_kv_heads=16, max_position=2048,
            dtype="bfloat16",
        )
        p = quantize_params(llama.init_params(cfg, jax.random.key(1)), "llama", quantize_lm_head=True)
        dt = ar_loop_time(cfg, p)
        print(f"int8 L={nl:2d}: {dt*1e3:6.3f} ms/token", flush=True)


def part_b():
    h, i = 2048, 8192
    x = jax.random.normal(jax.random.key(0), (1, h), jnp.bfloat16)
    sep = [quantize_tensor(jax.random.normal(jax.random.key(s), (h, h), jnp.float32) * 0.02)
           for s in range(3)]
    packed = quantize_tensor(jax.random.normal(jax.random.key(9), (h, 3 * h), jnp.float32) * 0.02)
    gu_sep = [quantize_tensor(jax.random.normal(jax.random.key(s + 10), (h, i), jnp.float32) * 0.02)
              for s in range(2)]
    gu_packed = quantize_tensor(jax.random.normal(jax.random.key(19), (h, 2 * i), jnp.float32) * 0.02)

    def mm(x, w):
        y = jnp.dot(x.astype(jnp.bfloat16), w["q"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * w["s"][None, :]

    def chain(op, n=300):
        @jax.jit
        def run(x):
            def body(j, carry):
                x, acc = carry
                r = op(x + acc * 1e-9)
                return x, jnp.sum(r)
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc
        a = run(x); float(a)
        t0 = time.perf_counter()
        a = run(x); float(a)
        return (time.perf_counter() - t0) / n

    t_sep = chain(lambda x: sum(jnp.sum(mm(x, w)) for w in sep))
    t_pack = chain(lambda x: jnp.sum(mm(x, packed)))
    print(f"qkv   separate: {t_sep*1e6:8.1f} us   packed: {t_pack*1e6:8.1f} us", flush=True)
    t_sep = chain(lambda x: sum(jnp.sum(mm(x, w)) for w in gu_sep))
    t_pack = chain(lambda x: jnp.sum(mm(x, gu_packed)))
    print(f"gate+up separate: {t_sep*1e6:8.1f} us   packed: {t_pack*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    part_a()
    part_b()
