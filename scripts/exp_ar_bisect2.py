"""Mutation bisect of the AR engine program's 3.8ms/token pathology."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import rollback
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig, dist_norm, dist_sample

cfg = LlamaConfig(
    vocab_size=32000, hidden_size=2048, intermediate_size=8192,
    num_layers=16, num_heads=16, num_kv_heads=16, max_position=2048,
    dtype="bfloat16",
)
bundle = ModelBundle("llama", cfg, llama.forward)
N = 128
scfg = SamplingConfig(1.0, 20, 0.9)
EOS = 2


def variant(kind):
    @jax.jit
    def run(params, prompt_padded, prompt_len, key):
        p_static = 64
        cache = bundle.make_cache(1, 64 + N)
        tokens = jnp.zeros((1, 64 + N), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))
        logits, cache = bundle.forward(params, cfg, prompt_padded, cache)
        if kind == "static_plen":
            last_logits = logits[:, p_static - 1]
            cache = rollback(cache, p_static)
            cur0 = jnp.asarray(p_static, jnp.int32)
        else:
            cache = rollback(cache, prompt_len)
            last_logits = jax.lax.dynamic_slice(
                logits, (0, prompt_len - 1, 0), (1, 1, cfg.vocab_size))[:, 0]
            cur0 = prompt_len
        total = cur0 + N

        def body_core(state):
            tokens, cur_len, cache, key, last_logits, done = state
            key, k_s = jax.random.split(key)
            if kind == "argmax":
                t = jnp.argmax(last_logits, -1).astype(jnp.int32)
            else:
                t = dist_sample(k_s, dist_norm(last_logits, scfg))
            if kind != "no_tokbuf":
                tokens = jax.lax.dynamic_update_slice(tokens, t[:, None], (0, cur_len))
            cur_len = cur_len + 1
            done = t[0] == EOS
            logits, cache = bundle.forward(params, cfg, t[:, None], cache)
            return tokens, cur_len, cache, key, logits[:, 0], done

        state = (tokens, cur0, cache, key, last_logits, jnp.asarray(False))
        if kind == "fori":
            def fbody(i, s):
                return body_core(s)
            state = jax.lax.fori_loop(0, N, fbody, state)
        else:
            def cond(s):
                return jnp.logical_and(s[1] < total, jnp.logical_not(s[5]))
            state = jax.lax.while_loop(cond, body_core, state)
        return state[0], state[1]

    return run


def main():
    params = llama.init_params(cfg, jax.random.key(1))
    prompt = jnp.asarray(np.random.default_rng(0).integers(100, 31000, (1, 64)), jnp.int32)
    for kind in ("baseline", "fori", "no_tokbuf", "argmax", "static_plen"):
        f = variant(kind)
        out = f(params, prompt, jnp.asarray(64, jnp.int32), jax.random.key(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(params, prompt, jnp.asarray(64, jnp.int32), jax.random.key(9))
        jax.block_until_ready(out)
        print(f"{kind:12s}: {(time.perf_counter()-t0)/N*1e3:7.3f} ms/token", flush=True)


if __name__ == "__main__":
    main()
