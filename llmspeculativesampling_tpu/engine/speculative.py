"""Speculative sampling core (L3) — the Google-style algorithm, TPU-first.

Capability parity: reference ``speculative_sampling``
(/root/reference/sampling/speculative_sampling.py:1877-2076): draft gamma
tokens with the small model, verify with ONE target forward, per-token
accept test r <= p/q, residual resample ``max_fn(p-q)`` on reject, bonus
target sample on all-accept, EOS truncation, and a ``details`` dict.

TPU re-design (SURVEY.md §7.3):
  * The reference runs a host Python loop with per-token ``.item()`` syncs
    and tensor-slicing rollbacks. Here the draft loop (``lax.scan``), the
    verify forward, and the vectorized accept/resample all live in one
    jitted step, and the outer token loop is a ``lax.while_loop`` — the
    whole generation is a single XLA program with zero host round-trips.
  * "Rollback" never moves data: each step re-derives both caches' valid
    lengths from ``cur_len`` (draft: cur_len-2, target: cur_len-1) and
    re-writes at most the last two positions idempotently (k/v of a
    position depend only on tokens at positions <= it, which are final).
  * The number of accepted tokens is computed as a cumprod over the gamma
    accept bits; control flow is ``where``-selects, never Python branches.

Parity quirks kept: acc_rate = mean of min(1, p/q) over ALL drafted tokens
(speculative_sampling.py:1966-1971); the loop may overshoot max_tokens by
up to gamma (loop condition :1934 checks before a step adds up to gamma+1
tokens); ``random_seed`` reproduces the reference's reseed-before-every-
draw quirk (:1976-1978) by reusing one fixed uniform vector for accepts.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..cache.kvcache import KVCache, rollback
from ..ops.sampling import (
    SamplingConfig,
    dist_concat,
    dist_norm,
    dist_pad_zero_rows,
    dist_prob_of,
    dist_residual,
    dist_sample,
    dist_take,
)
from .phases import fill_phase_split
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


class SpecState(NamedTuple):
    tokens: jax.Array  # [1, T_max]
    cur_len: jax.Array  # int32
    draft_cache: KVCache
    target_cache: KVCache
    key: jax.Array
    done: jax.Array  # bool
    accepted: jax.Array  # int32 total accepted draft tokens
    resamples: jax.Array  # int32 reject-resample count
    bonus: jax.Array  # int32 all-accept bonus-sample count
    steps: jax.Array  # int32 = target_call_times = approx_call_times
    acc_rate_sum: jax.Array  # f32 sum of min(1, p/q) over drafted tokens
    acc_len_hist: jax.Array  # int32 [max_steps] accepted-per-step


def draft_phase(bundle, params, scfg, gamma, tokens, cur_len, cache, key):
    """gamma-token draft. Returns (tokens', cache', q_stack [g,V], drafts [g], key).

    First forward re-processes positions cur_len-2, cur_len-1 (2 tokens) so
    the cache "rollback" is just the length reset; remaining gamma-1 steps
    are single-token forwards under ``lax.scan``.
    """
    cfg = bundle.cfg
    cache = rollback(cache, cur_len - 2)
    first_in = jax.lax.dynamic_slice(tokens, (0, cur_len - 2), (1, 2))
    logits, cache = bundle.forward(params, cfg, first_in, cache)
    q0 = dist_norm(logits[:, -1], scfg)  # dist over batch [1]
    key, k0 = jax.random.split(key)
    x0 = dist_sample(k0, q0)  # [1]
    tokens = jax.lax.dynamic_update_slice(tokens, x0[:, None], (0, cur_len))

    def body(carry, _):
        cache, last_tok, key = carry
        logits, cache = bundle.forward(params, cfg, last_tok[:, None], cache)
        q = dist_norm(logits[:, 0], scfg)
        key, ks = jax.random.split(key)
        x = dist_sample(ks, q)
        return (cache, x, key), (dist_take(q, 0), x[0])

    if gamma > 1:
        (cache, _, key), (q_rest, x_rest) = jax.lax.scan(
            body, (cache, x0, key), None, length=gamma - 1
        )
        q_stack = dist_concat([q0, q_rest], axis=0)  # rows: gamma
        drafts = jnp.concatenate([x0, x_rest])  # [gamma]
        tokens = jax.lax.dynamic_update_slice(tokens, x_rest[None, :], (0, cur_len + 1))
    else:
        q_stack, drafts = q0, x0
    return tokens, cache, q_stack, drafts, key


def verify_phase(bundle, params, scfg, gamma, tokens, cur_len, cache):
    """One target forward over the gamma+1 tail tokens -> p_stack [g+1, V]."""
    cfg = bundle.cfg
    cache = rollback(cache, cur_len - 1)
    vin = jax.lax.dynamic_slice(tokens, (0, cur_len - 1), (1, gamma + 1))
    logits, cache = bundle.forward(params, cfg, vin, cache)
    return dist_norm(logits[0], scfg), cache  # rows: gamma+1


def accept_phase(scfg, gamma, eos_token_id, tokens, cur_len, q_stack, drafts, p_stack, key, fixed_r=None):
    """Vectorized accept/resample. Returns (tokens', new_len, t, n, acc_rate_step, key).

    Reference math (speculative_sampling.py:1964-2023): accept draft i iff
    r_i <= p_i(x_i)/q_i(x_i); on first reject at n, resample from
    max_fn(p_n - q_n); on all-accept, bonus-sample from p_gamma.
    """
    rows = jnp.arange(gamma)
    q_sel = dist_prob_of(q_stack, drafts)  # [gamma]
    p_sel = dist_prob_of(dist_take(p_stack, rows), drafts)
    ratio = p_sel / q_sel
    key, k_r, k_t = jax.random.split(key, 3)
    r = fixed_r if fixed_r is not None else jax.random.uniform(k_r, (gamma,))
    accept = r <= ratio
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32))
    n = jnp.sum(acc_prefix)  # leading accepts, 0..gamma

    # residual resample at position n (guarded gather; only used when n<gamma)
    q_padded = dist_pad_zero_rows(q_stack, 1)
    p_n = dist_take(p_stack, n)
    q_n = dist_take(q_padded, n)
    resid = dist_residual(p_n, q_n)
    t_resample = dist_sample(k_t, resid)
    t_bonus = dist_sample(k_t, dist_take(p_stack, gamma))
    all_acc = n == gamma
    t = jnp.where(all_acc, t_bonus, t_resample)

    new_len = cur_len + n + 1
    tokens = jax.lax.dynamic_update_slice(tokens, t[None, None], (0, new_len - 1))
    acc_rate_step = jnp.sum(jnp.minimum(ratio, 1.0))
    return tokens, new_len, t, n, all_acc, acc_rate_step, key


def _spec_step(bundle_d, bundle_t, params_d, params_t, scfg, gamma, eos_token_id, state: SpecState, fixed_r):
    tokens, cur_len = state.tokens, state.cur_len
    tokens, draft_cache, q_stack, drafts, key = draft_phase(
        bundle_d, params_d, scfg, gamma, tokens, cur_len, state.draft_cache, state.key
    )
    p_stack, target_cache = verify_phase(
        bundle_t, params_t, scfg, gamma, tokens, cur_len, state.target_cache
    )
    tokens, new_len, t, n, all_acc, acc_rate_step, key = accept_phase(
        scfg, gamma, eos_token_id, tokens, cur_len, q_stack, drafts, p_stack, key, fixed_r
    )

    # EOS among the newly committed tokens [cur_len, new_len)
    pos = jnp.arange(tokens.shape[1])
    new_mask = (pos >= cur_len) & (pos < new_len)
    done = jnp.any(new_mask & (tokens[0] == eos_token_id))

    acc_len_hist = jax.lax.dynamic_update_slice(state.acc_len_hist, n[None], (state.steps,))
    return SpecState(
        tokens=tokens,
        cur_len=new_len,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=done,
        accepted=state.accepted + n,
        resamples=state.resamples + jnp.where(all_acc, 0, 1),
        bonus=state.bonus + jnp.where(all_acc, 1, 0),
        steps=state.steps + 1,
        acc_rate_sum=state.acc_rate_sum + acc_rate_step,
        acc_len_hist=acc_len_hist,
    )


@partial(
    jax.jit,
    static_argnames=(
        "bundle_d", "bundle_t", "gamma", "max_new_tokens", "scfg", "eos_token_id", "max_total_len",
    ),
)
def _spec_generate_device(
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
    draft_cache = bundle_d.make_cache(1, max_total_len)
    target_cache = bundle_t.make_cache(1, max_total_len)

    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))

    _, draft_cache = bundle_d.forward(params_d, bundle_d.cfg, prompt_padded, draft_cache)
    _, target_cache = bundle_t.forward(params_t, bundle_t.cfg, prompt_padded, target_cache)

    total = prompt_len + max_new_tokens
    state = SpecState(
        tokens=tokens,
        cur_len=prompt_len,
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=key,
        done=jnp.asarray(False),
        accepted=jnp.zeros((), jnp.int32),
        resamples=jnp.zeros((), jnp.int32),
        bonus=jnp.zeros((), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
        acc_rate_sum=jnp.zeros((), jnp.float32),
        acc_len_hist=jnp.zeros((max_new_tokens,), jnp.int32),
    )

    def cond(s: SpecState):
        return jnp.logical_and(s.cur_len < total, jnp.logical_not(s.done))

    def body(s: SpecState):
        return _spec_step(bundle_d, bundle_t, params_d, params_t, scfg, gamma, eos_token_id, s, fixed_r)

    state = jax.lax.while_loop(cond, body, state)
    return state


@partial(jax.jit, static_argnames=("bundle", "scfg", "gamma"))
def _draft_jit(params, tokens, cur_len, cache, key, *, bundle, scfg, gamma):
    return draft_phase(bundle, params, scfg, gamma, tokens, cur_len, cache, key)


@partial(jax.jit, static_argnames=("bundle", "scfg", "gamma"))
def _verify_jit(params, tokens, cur_len, cache, *, bundle, scfg, gamma):
    return verify_phase(bundle, params, scfg, gamma, tokens, cur_len, cache)


@partial(jax.jit, static_argnames=("scfg", "gamma", "eos_token_id"))
def _accept_jit(tokens, cur_len, q_stack, drafts, p_stack, key, fixed_r, *,
                scfg, gamma, eos_token_id):
    return accept_phase(
        scfg, gamma, eos_token_id, tokens, cur_len, q_stack, drafts, p_stack,
        key, fixed_r,
    )


def _decode_one(tok: int) -> str:
    """Best-effort token text via the Decoder singleton (globals.py:11-22);
    falls back to the raw id when no tokenizer is attached."""
    from ..utils.decoder import Decoder

    d = Decoder()
    if d.tokenizer is None:
        return str(tok)
    return d.decode([int(tok)])


def _spec_generate_stepwise(
    bundle_d, params_d, bundle_t, params_t, prompt_padded, p_len,
    max_new_tokens, gamma, scfg, eos_token_id, max_total, key,
    random_seed, details, verbose=False,
):
    """Host-stepped diagnostic variant with the reference's phase timers."""
    fixed_r = None
    if random_seed is not None:
        fixed_r = jnp.broadcast_to(
            jax.random.uniform(jax.random.key(random_seed), ()), (gamma,))

    draft_cache = bundle_d.make_cache(1, max_total)
    target_cache = bundle_t.make_cache(1, max_total)
    tokens = jnp.zeros((1, max_total), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, jnp.asarray(prompt_padded), (0, 0))

    t0 = time.perf_counter()
    _, draft_cache = bundle_d.forward(params_d, bundle_d.cfg, jnp.asarray(prompt_padded), draft_cache)
    _, target_cache = bundle_t.forward(params_t, bundle_t.cfg, jnp.asarray(prompt_padded), target_cache)
    jax.block_until_ready((draft_cache.length, target_cache.length))

    cur_len = jnp.asarray(p_len, jnp.int32)
    total = p_len + max_new_tokens
    approx_t = target_t = 0.0
    acc_len, acc_rate_sum, steps = [], 0.0, 0

    while int(cur_len) < total:
        ta = time.perf_counter()
        tokens, draft_cache, q_stack, drafts, key = _draft_jit(
            params_d, tokens, cur_len, draft_cache, key,
            bundle=bundle_d, scfg=scfg, gamma=gamma)
        jax.block_until_ready(drafts)
        tb = time.perf_counter()
        p_stack, target_cache = _verify_jit(
            params_t, tokens, cur_len, target_cache,
            bundle=bundle_t, scfg=scfg, gamma=gamma)
        jax.block_until_ready(target_cache.length)
        tc = time.perf_counter()
        tokens, cur_len, _, n, _, acc_step, key = _accept_jit(
            tokens, cur_len, q_stack, drafts, p_stack, key, fixed_r,
            scfg=scfg, gamma=gamma, eos_token_id=eos_token_id)
        approx_t += tb - ta
        target_t += tc - tb
        steps += 1
        acc_len.append(int(n))
        acc_rate_sum += float(acc_step)
        # host EOS check over the committed window (diagnostic mode syncs anyway)
        window = np.asarray(jax.lax.dynamic_slice(
            tokens, (0, cur_len - (int(n) + 1)), (1, gamma + 1)))[0]
        if verbose:
            # reference per-token streaming (speculative_sampling.py:1986-2021):
            # accepted guesses red, reject-resample blue, bonus sample magenta.
            ni = int(n)
            for j in window[:ni]:
                print(f"approx guess accepted {int(j)}: "
                      f"\033[31m{_decode_one(j)}\033[0m")
            t_tok = int(window[ni])
            pos = int(cur_len) - 1
            if ni == gamma:
                print(f"target samples {pos}: \033[35m{_decode_one(t_tok)}\033[0m")
            else:
                print(f"target resamples at position {pos}: "
                      f"\033[34m{_decode_one(t_tok)}\033[0m")
        if eos_token_id in window[: int(n) + 1]:
            break
    wall = time.perf_counter() - t0
    if verbose:
        # end-of-run summary (speculative_sampling.py:2053-2060)
        print(f"generated tokens numbers {int(cur_len) - p_len}, "
              f"accepted_count {sum(acc_len)}")
        print(f"Acc rate: {acc_rate_sum / max(steps * gamma, 1)}")
        print("approx model time", approx_t)
        print("target model time", target_t)
        print("other time", wall - approx_t - target_t)
        print("acc len", float(np.mean(acc_len)) if acc_len else 0.0,
              len(acc_len), acc_len)

    out = first_eos_truncate(np.asarray(tokens), p_len, int(cur_len), eos_token_id)
    if not details:
        return out
    drafted = steps * gamma
    d = {
        "total_time": wall,
        "approx_time": approx_t,
        "target_time": target_t,
        "other_time": wall - approx_t - target_t,
        # kvcache_model.py:33-36 sub-timers: verify dispatch is all model
        # time here (cache prep + prob norm are fused on device).
        "target_model_time": target_t,
        "target_pre_cache_time": 0.0,
        "target_post_prob_time": 0.0,
        "phase_split_method": "measured",
        "acc_len": acc_len,
        "acc_rate": acc_rate_sum / max(drafted, 1),
        "target_call_times": steps,
        "approx_call_times": steps,
        "tokens_generated": len(out) - p_len,
        "tokens_per_s": (len(out) - p_len) / wall if wall > 0 else float("nan"),
    }
    return out, d


def speculative_generate(
    bundle_d: ModelBundle,
    params_d,
    bundle_t: ModelBundle,
    params_t,
    prompt,
    max_new_tokens: int,
    *,
    gamma: int = 4,
    eos_token_id: int,
    pad_token_id: Optional[int] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    random_seed: Optional[int] = None,
    details: bool = False,
    stepwise: bool = False,
    verbose: bool = False,
    tp_mesh=None,
):
    """Speculative sampling with KV rollback — reference
    ``speculative_sampling`` equivalent. Returns numpy int32 [T] (prompt
    included, truncated at first generated EOS); with ``details=True`` also
    a dict with the reference's schema (SURVEY.md §2.1).

    ``stepwise=True`` runs the outer token loop on the host with the
    draft/verify/accept phases as separate synchronized dispatches, filling
    the reference's approx/target/other phase-time split
    (speculative_sampling.py:1937-1962, 2061-2074) at the cost of per-phase
    host round trips — a diagnostic mode; the fused program is the fast
    path.

    ``tp_mesh``: pass the tensor-parallel mesh the params are sharded over
    to replace the per-step full-vocab logit all-gather with the
    tp·k-candidate distributed top-k (ops/sampling.py
    ``norm_logits_topk_tp``); requires top_k > 0."""
    del pad_token_id
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    if p_len < 2:
        raise ValueError("prompt must have at least 2 tokens")
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + gamma + 1)
    if stepwise or verbose:
        # verbose token streaming (reference speculative_sampling.py:1986-2021)
        # requires per-step host sync, so it rides the stepwise path.
        return _spec_generate_stepwise(
            bundle_d, params_d, bundle_t, params_t, prompt_padded, p_len,
            max_new_tokens, gamma, scfg, eos_token_id, max_total, key,
            random_seed, details, verbose=verbose,
        )

    fixed_r = None
    if random_seed is not None:
        # reference reseeds before every accept draw (:1976-1978) => all r
        # draws in a run are the same number; reproduce with one fixed vec.
        fixed_r = jnp.broadcast_to(jax.random.uniform(jax.random.key(random_seed), ()), (gamma,))

    t0 = time.perf_counter()
    state = _spec_generate_device(
        params_d,
        params_t,
        jnp.asarray(prompt_padded),
        jnp.asarray(p_len, jnp.int32),
        key,
        fixed_r,
        bundle_d=bundle_d,
        bundle_t=bundle_t,
        gamma=gamma,
        max_new_tokens=max_new_tokens,
        scfg=scfg,
        eos_token_id=eos_token_id,
        max_total_len=max_total,
    )
    tokens = jax.device_get(state.tokens)
    cur_len = int(state.cur_len)
    wall = time.perf_counter() - t0

    out = first_eos_truncate(tokens, p_len, cur_len, eos_token_id)
    if not details:
        return out

    steps = int(state.steps)
    drafted = steps * gamma
    d = {
        "total_time": wall,
        "acc_len": jax.device_get(state.acc_len_hist)[:steps].tolist(),
        "acc_rate": float(state.acc_rate_sum) / max(drafted, 1),
        "target_call_times": steps,
        "approx_call_times": steps,
        "accepted_count": int(state.accepted),
        "resample_count": int(state.resamples),
        "target_sample_count": int(state.bonus),
        "tokens_generated": len(out) - p_len,
        "tokens_per_s": (len(out) - p_len) / wall if wall > 0 else float("nan"),
    }
    fill_phase_split(
        d, wall, steps, bundle_d, params_d, bundle_t, params_t,
        draft_rows=1, verify_rows=1, gamma=gamma, verify_tokens=gamma + 1,
        max_total=max_total,
    )
    return out, d
