"""Big-Little Decoder (BiLD) policy (L3).

Capability parity: reference ``BiLD_sampling``
(/root/reference/sampling/speculative_sampling.py:1718-1872): the small
model decodes until its max token prob drops below ``fallback_thres`` or
``gamma`` unchecked tokens accumulate (:1784); then ONE target forward
scores all unchecked tokens, rolling back at the first position whose
target NLL exceeds ``rollback_thres`` (:1798-1803); the target samples the
next token from its own distribution at the rollback point (:1811).

TPU design: one jitted program — the small-model decode and the fallback
check both live in a single ``lax.while_loop`` iteration, with the check
under ``lax.cond``. The target verify re-processes a *fixed* gamma+1-token
window ending at the current position (idempotent k/v rewrite; positions
before ``last_check`` are masked out of the NLL test), so shapes never
depend on how many tokens are unchecked.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import rollback
from ..ops.sampling import (
    SamplingConfig,
    TopKDist,
    dist_norm,
    dist_prob_of,
    dist_sample,
    dist_take,
    sample,
)
from .phases import calibrate_phase_times
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


@partial(
    jax.jit,
    static_argnames=(
        "bundle_d", "bundle_t", "gamma", "max_new_tokens", "scfg",
        "eos_token_id", "max_total_len", "fallback_thres", "rollback_thres",
    ),
)
def _bild_device(
    params_d,
    params_t,
    prompt_padded,
    prompt_len,
    key,
    *,
    bundle_d: ModelBundle,
    bundle_t: ModelBundle,
    gamma: int,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
    fallback_thres: float,
    rollback_thres: float,
):
    cfg_d, cfg_t = bundle_d.cfg, bundle_t.cfg
    draft_cache = bundle_d.make_cache(1, max_total_len)
    target_cache = bundle_t.make_cache(1, max_total_len)
    w = gamma + 1  # verify window

    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))
    _, draft_cache = bundle_d.forward(params_d, cfg_d, prompt_padded, draft_cache)
    _, target_cache = bundle_t.forward(params_t, cfg_t, prompt_padded, target_cache)

    total = prompt_len + max_new_tokens

    def cond(s):
        return jnp.logical_and(s[1] < total, jnp.logical_not(s[5]))

    def body(s):
        (tokens, cur_len, draft_cache, target_cache, key, done,
         last_check, acc_sum, check_cnt, small_cnt, hist) = s

        # --- small model decodes one token (1778-1784) ---
        draft_cache = rollback(draft_cache, cur_len - 1)
        last_tok = jax.lax.dynamic_slice(tokens, (0, cur_len - 1), (1, 1))
        logits, draft_cache = bundle_d.forward(params_d, cfg_d, last_tok, draft_cache)
        q = dist_norm(logits[:, 0], scfg)
        key, ks = jax.random.split(key)
        x = dist_sample(ks, q)
        tokens = jax.lax.dynamic_update_slice(tokens, x[:, None], (0, cur_len))
        new_len = cur_len + 1  # length including the new small-model token

        q_max = jnp.max(q.probs if isinstance(q, TopKDist) else q)
        need_check = jnp.logical_or(
            q_max < fallback_thres,
            (new_len - last_check - 1) >= gamma,
        )

        def do_check(args):
            tokens, target_cache, key, last_check = args
            # fixed window of w tokens ending at new_len-1 (inputs), giving
            # p for positions [start+1, new_len]
            start = jnp.maximum(new_len - w, 0).astype(jnp.int32)
            target_cache_r = rollback(target_cache, start)
            vin = jax.lax.dynamic_slice(tokens, (0, start), (1, w))
            logits, target_cache_r = bundle_t.forward(params_t, cfg_t, vin, target_cache_r)
            p_win = dist_norm(logits[0], scfg)  # rows predict start+1..start+w

            # NLL test on positions i in [last_check, new_len-2]: token x[i+1]
            rows = jnp.arange(w)  # row r predicts position start+1+r
            pos_i = start + rows  # the "i" of the reference loop
            next_tok = jnp.take(tokens[0], jnp.clip(pos_i + 1, 0, tokens.shape[1] - 1))
            p_next = dist_prob_of(p_win, next_tok)
            in_range = (pos_i >= last_check) & (pos_i <= new_len - 2)
            bad = in_range & (-jnp.log(p_next + 1e-30) > rollback_thres)
            any_bad = jnp.any(bad)
            first_bad = jnp.argmax(bad)  # row index of first bad position
            n = jnp.where(any_bad, start + first_bad, new_len - 1)
            l = n - last_check  # accepted unchecked tokens

            # target samples next token from p at position n (:1811)
            p_n = dist_take(p_win, jnp.clip(n - start, 0, w - 1))
            key2, kt = jax.random.split(key)
            if isinstance(p_n, TopKDist):
                t = dist_sample(kt, p_n)[None]
            else:
                t = sample(kt, p_n[None])
            tokens2 = jax.lax.dynamic_update_slice(tokens, t[:, None], (0, n + 1))
            target_cache_r = rollback(target_cache_r, n + 1)
            return tokens2, target_cache_r, key2, n + 1, n + 2, l

        def no_check(args):
            tokens, target_cache, key, last_check = args
            return tokens, target_cache, key, last_check, new_len, jnp.zeros((), jnp.int32)

        tokens, target_cache, key, last_check, out_len, l = jax.lax.cond(
            need_check, do_check, no_check, (tokens, target_cache, key, last_check)
        )

        # EOS among committed tokens [cur_len, out_len)
        pos = jnp.arange(tokens.shape[1])
        new_mask = (pos >= cur_len) & (pos < out_len)
        done = jnp.any(new_mask & (tokens[0] == eos_token_id))

        hist = jnp.where(
            need_check,
            jax.lax.dynamic_update_slice(hist, l[None], (check_cnt,)),
            hist,
        )
        return (
            tokens, out_len, draft_cache, target_cache, key, done,
            last_check, acc_sum + l, check_cnt + jnp.where(need_check, 1, 0),
            small_cnt + 1, hist,
        )

    state = (
        tokens, prompt_len, draft_cache, target_cache, key, jnp.asarray(False),
        prompt_len - 1, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), jnp.zeros((max_new_tokens + 1,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    return out[0], out[1], out[7], out[8], out[9], out[10]


def bild_generate(
    bundle_d: ModelBundle,
    params_d,
    bundle_t: ModelBundle,
    params_t,
    prompt,
    max_new_tokens: int,
    *,
    gamma: int = 10,
    fallback_thres: float = 0.6,
    rollback_thres: float = 5.0,
    eos_token_id: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    random_seed: Optional[int] = None,
    details: bool = False,
    tp_mesh=None,
):
    """BiLD policy decode — reference ``BiLD_sampling`` equivalent.

    ``random_seed`` is accepted for signature parity
    (speculative_sampling.py:1723); the reference never consumes it in
    BiLD (no reseed inside :1718-1872) — the policy is threshold-driven."""
    del random_seed
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + 2)

    t0 = time.perf_counter()
    (tokens, cur_len, acc_sum, check_cnt, small_cnt,
     acc_len_hist) = _bild_device(
        params_d, params_t, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        bundle_d=bundle_d, bundle_t=bundle_t, gamma=gamma,
        max_new_tokens=max_new_tokens, scfg=scfg, eos_token_id=eos_token_id,
        max_total_len=max_total, fallback_thres=float(fallback_thres),
        rollback_thres=float(rollback_thres),
    )
    tokens = jax.device_get(tokens)
    wall = time.perf_counter() - t0
    out = first_eos_truncate(tokens, p_len, int(cur_len), eos_token_id)
    if not details:
        return out
    checks = int(check_cnt)
    d = {
        "total_time": wall,
        # the reference declares acc_rate for BiLD but never appends to it
        # (speculative_sampling.py:1750,1865) so it reports np.mean([]) = NaN;
        # keep the key for schema parity with the same value.
        "acc_rate": float("nan"),
        "acc_len": jax.device_get(acc_len_hist)[:checks].tolist(),
        "accepted_count": int(acc_sum),
        "target_call_times": checks,
        "approx_call_times": int(small_cnt),
        "tokens_generated": len(out) - p_len,
        "tokens_per_s": (len(out) - p_len) / wall if wall > 0 else float("nan"),
    }
    # approx phase = small_cnt single-token forwards; target phase =
    # check_cnt (gamma+1)-token window forwards
    t_draft, t_verify = calibrate_phase_times(
        bundle_d, params_d, bundle_t, params_t,
        draft_rows=1, verify_rows=1, gamma=1, verify_tokens=gamma + 1,
        max_total=max_total,
    )
    approx = int(small_cnt) * t_draft
    target = checks * t_verify
    if approx + target > wall > 0:
        scale = wall / (approx + target)
        approx, target = approx * scale, target * scale
    d.update(approx_time=approx, target_time=target,
             other_time=max(wall - approx - target, 0.0),
             target_model_time=target, target_pre_cache_time=0.0,
             target_post_prob_time=0.0, phase_split_method="calibrated")
    return out, d
