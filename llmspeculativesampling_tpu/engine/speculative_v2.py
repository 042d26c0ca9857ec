"""DeepMind-style speculative sampling WITHOUT KV cache (L3).

Capability parity: reference ``speculative_sampling_v2``
(/root/reference/sampling/speculative_sampling.py:2079-2194, arXiv
2302.01318): re-runs both models over the full prefix every round; accept /
residual math identical to the cached version. Exists for parity and as a
differential oracle for the cached engine (same distribution, different
compute path).

TPU design: still one fused XLA program — each round runs full-prefix
forwards over the static token buffer with *fresh* caches (length 0), so
the no-cache semantics are honest while shapes stay fixed.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.sampling import SamplingConfig, norm_logits, sample
from .phases import fill_phase_split
from .speculative import accept_phase
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


@partial(
    jax.jit,
    static_argnames=("bundle_d", "bundle_t", "gamma", "max_new_tokens", "scfg", "eos_token_id", "max_total_len"),
)
def _spec_v2_device(
    params_d,
    params_t,
    prompt_padded,
    prompt_len,
    key,
    fixed_r,
    *,
    bundle_d: ModelBundle,
    bundle_t: ModelBundle,
    gamma: int,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
):
    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))
    total = prompt_len + max_new_tokens

    def full_logits_at(bundle, params, tokens, row):
        """Fresh-cache full forward; return filtered probs at ``row``."""
        cache = bundle.make_cache(1, max_total_len)
        logits, _ = bundle.forward(params, bundle.cfg, tokens, cache)
        return jax.lax.dynamic_slice(
            logits, (0, row, 0), (1, 1, bundle.cfg.vocab_size)
        )[:, 0]

    def cond(state):
        _, cur_len, _, done, *_ = state
        return jnp.logical_and(cur_len < total, jnp.logical_not(done))

    def body(state):
        (tokens, cur_len, key, done, accepted, steps,
         hist, rate_sum) = state

        def draft_step(carry, _):
            tokens, pos, key = carry
            logits = full_logits_at(bundle_d, params_d, tokens, pos - 1)
            q = norm_logits(logits, scfg)
            key, ks = jax.random.split(key)
            x = sample(ks, q)
            tokens = jax.lax.dynamic_update_slice(tokens, x[:, None], (0, pos))
            return (tokens, pos + 1, key), (q[0], x[0])

        (tokens, _, key), (q_stack, drafts) = jax.lax.scan(
            draft_step, (tokens, cur_len, key), None, length=gamma
        )

        # one full target forward; gather the gamma+1 rows
        cache = bundle_t.make_cache(1, max_total_len)
        logits, _ = bundle_t.forward(params_t, bundle_t.cfg, tokens, cache)
        window = jax.lax.dynamic_slice(
            logits, (0, cur_len - 1, 0), (1, gamma + 1, bundle_t.cfg.vocab_size)
        )[0]
        p_stack = norm_logits(window, scfg)

        tokens, new_len, _, n, _, acc_step, key = accept_phase(
            scfg, gamma, eos_token_id, tokens, cur_len, q_stack, drafts, p_stack,
            key, fixed_r
        )
        pos = jnp.arange(tokens.shape[1])
        new_mask = (pos >= cur_len) & (pos < new_len)
        done = jnp.any(new_mask & (tokens[0] == eos_token_id))
        hist = jax.lax.dynamic_update_slice(hist, n[None], (steps,))
        return (tokens, new_len, key, done, accepted + n, steps + 1,
                hist, rate_sum + acc_step)

    state = (
        tokens, prompt_len, key, jnp.asarray(False),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((max_new_tokens,), jnp.int32), jnp.zeros((), jnp.float32),
    )
    (tokens, cur_len, _, _, accepted, steps,
     acc_len_hist, acc_rate_sum) = jax.lax.while_loop(cond, body, state)
    return tokens, cur_len, accepted, steps, acc_len_hist, acc_rate_sum


def speculative_generate_v2(
    bundle_d: ModelBundle,
    params_d,
    bundle_t: ModelBundle,
    params_t,
    prompt,
    max_new_tokens: int,
    *,
    gamma: int = 4,
    eos_token_id: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    random_seed: Optional[int] = None,
    details: bool = False,
    tp_mesh=None,
):
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + gamma + 1)

    fixed_r = None
    if random_seed is not None:
        # reference reseeds before every accept draw (:2150-2151) => all r
        # draws equal one fixed uniform; reproduce with a fixed vector.
        fixed_r = jnp.broadcast_to(
            jax.random.uniform(jax.random.key(random_seed), ()), (gamma,))

    t0 = time.perf_counter()
    (tokens, cur_len, accepted, steps,
     acc_len_hist, acc_rate_sum) = _spec_v2_device(
        params_d, params_t, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        fixed_r,
        bundle_d=bundle_d, bundle_t=bundle_t, gamma=gamma,
        max_new_tokens=max_new_tokens, scfg=scfg,
        eos_token_id=eos_token_id, max_total_len=max_total,
    )
    tokens = jax.device_get(tokens)
    wall = time.perf_counter() - t0
    out = first_eos_truncate(tokens, p_len, int(cur_len), eos_token_id)
    if not details:
        return out
    steps_i = int(steps)
    d = {
        "total_time": wall,
        "acc_len": jax.device_get(acc_len_hist)[:steps_i].tolist(),
        "acc_rate": float(acc_rate_sum) / max(steps_i * gamma, 1),
        "accepted_count": int(accepted),
        "target_call_times": steps_i,
        "approx_call_times": steps_i,
        "tokens_generated": len(out) - p_len,
        "tokens_per_s": (len(out) - p_len) / wall if wall > 0 else float("nan"),
    }
    fill_phase_split(
        d, wall, steps_i, bundle_d, params_d, bundle_t, params_t,
        draft_rows=1, verify_rows=1, gamma=gamma, verify_tokens=gamma + 1,
        max_total=max_total, draft_mode="full",
    )
    return out, d
