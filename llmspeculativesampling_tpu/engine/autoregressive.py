"""Autoregressive baseline decoder (L3).

Capability parity: reference ``autoregressive_sampling``
(/root/reference/sampling/autoregressive_sampling.py:8-61): prefill, then
1-token incremental forwards with KV cache, sample via the
temperature/top-k/top-p pipeline, stop after N tokens or on EOS.

TPU design: prefill + the entire decode loop compile into ONE XLA program
(``lax.while_loop`` with a static-shape token buffer), so there are zero
host syncs per token — vs. the reference's per-token ``.item()`` syncs
(SURVEY.md §3.5 pathology list).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import rollback
from ..ops.sampling import SamplingConfig, dist_norm, dist_sample
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


@partial(
    jax.jit,
    static_argnames=("bundle", "max_new_tokens", "scfg", "eos_token_id", "max_total_len"),
)
def _ar_generate_device(
    params,
    prompt_padded: jax.Array,  # [1, P_bucket]
    prompt_len: jax.Array,  # int32 scalar
    key: jax.Array,
    *,
    bundle: ModelBundle,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
):
    cfg = bundle.cfg
    p_bucket = prompt_padded.shape[1]
    cache = bundle.make_cache(1, max_total_len)

    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))

    logits, cache = bundle.forward(params, cfg, prompt_padded, cache)
    cache = rollback(cache, prompt_len)
    last_logits = jax.lax.dynamic_slice(logits, (0, prompt_len - 1, 0), (1, 1, cfg.vocab_size))[:, 0]

    total = prompt_len + max_new_tokens

    def cond(state):
        _, cur_len, _, _, _, done = state
        return jnp.logical_and(cur_len < total, jnp.logical_not(done))

    def body(state):
        tokens, cur_len, cache, key, last_logits, done = state
        key, k_s = jax.random.split(key)
        t = dist_sample(k_s, dist_norm(last_logits, scfg))  # [1]
        tokens = jax.lax.dynamic_update_slice(tokens, t[:, None], (0, cur_len))
        cur_len = cur_len + 1
        done = t[0] == eos_token_id
        logits, cache = bundle.forward(params, cfg, t[:, None], cache)
        return tokens, cur_len, cache, key, logits[:, 0], done

    state = (tokens, prompt_len, cache, key, last_logits, jnp.asarray(False))
    tokens, cur_len, *_ = jax.lax.while_loop(cond, body, state)
    return tokens, cur_len


def autoregressive_generate(
    bundle: ModelBundle,
    params,
    prompt,
    max_new_tokens: int,
    *,
    eos_token_id: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    pad_token_id: Optional[int] = None,  # parity arg; EOS handling only needs eos
    details: bool = False,
    tp_mesh=None,
):
    """Generate ``max_new_tokens`` tokens autoregressively. Returns the
    generated sequence (prompt included) as numpy int32 [T]; with
    ``details=True`` also a timing dict mirroring the reference schema.
    ``tp_mesh``: see ``speculative_generate`` (distributed top-k sampling
    over tensor-parallel shards)."""
    del pad_token_id
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens)

    t0 = time.perf_counter()
    tokens, cur_len = _ar_generate_device(
        params,
        jnp.asarray(prompt_padded),
        jnp.asarray(p_len, jnp.int32),
        key,
        bundle=bundle,
        max_new_tokens=max_new_tokens,
        scfg=scfg,
        eos_token_id=eos_token_id,
        max_total_len=max_total,
    )
    tokens = jax.device_get(tokens)
    cur_len = int(cur_len)
    wall = time.perf_counter() - t0

    out = first_eos_truncate(tokens, p_len, cur_len, eos_token_id)
    if not details:
        return out
    n_gen = max(len(out) - p_len, 1)
    d = {
        "total_time": wall,
        "tokens_generated": len(out) - p_len,
        "s_per_token": wall / n_gen,
        "tokens_per_s": n_gen / wall,
    }
    return out, d
