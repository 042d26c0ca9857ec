"""Multi-candidate speculative sampling (L3) — iid strategy.

Capability parity: reference ``multi_speculative_sampling``
(/root/reference/sampling/speculative_sampling.py:1379-1716) with
``strategy='iid'`` (:1531-1545): the draft proposes ``width`` candidate
continuations i.i.d. (prefix repeated width-x in batch), ONE batched target
forward verifies all candidates, each candidate is scored by its leading
run of accepted tokens (standard r < min(1, p/q) test, :1612-1640), and the
longest-accepted candidate wins (first such index). Rollback selects that
candidate's batch row (:1647-1674); on reject, resample from
``max_fn(p[choice,n] - q[choice,l])``; on full accept, bonus-sample.
The 'beam' strategy lives in engine/beam_spec.py (needs the beam draft);
'diverse' is NotImplemented in the reference (:1510) and stays out.

TPU design: both caches are allocated at batch=width for the whole run;
between steps every row holds the committed state (a static row-gather
re-broadcasts the winner — the reference's select-then-repeat reallocation,
kvcache_model.py:184-200, becomes one ``take``). Draft scan, batched
verify, and the width-x-gamma vectorized accept all fuse into one step
under the outer ``lax.while_loop``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import rollback, select_rows
from ..ops.sampling import (
    SamplingConfig,
    TopKDist,
    dist_norm,
    dist_pad_zero_rows,
    dist_prob_of,
    dist_residual,
    dist_sample,
    dist_take,
    sample,
)
from .phases import fill_phase_split
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


@partial(
    jax.jit,
    static_argnames=(
        "bundle_d", "bundle_t", "gamma", "width", "max_new_tokens", "scfg",
        "eos_token_id", "max_total_len",
    ),
)
def _multi_device(
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
    width: int,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
):
    cfg_d, cfg_t = bundle_d.cfg, bundle_t.cfg
    w = width
    draft_cache = bundle_d.make_cache(w, max_total_len)
    target_cache = bundle_t.make_cache(w, max_total_len)

    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))

    rep = jnp.broadcast_to(prompt_padded, (w, prompt_padded.shape[1]))
    _, draft_cache = bundle_d.forward(params_d, cfg_d, rep, draft_cache)
    _, target_cache = bundle_t.forward(params_t, cfg_t, rep, target_cache)

    total = prompt_len + max_new_tokens

    def cond(s):
        return jnp.logical_and(s[1] < total, jnp.logical_not(s[5]))

    def body(s):
        (tokens, cur_len, draft_cache, target_cache, key, done,
         accepted, steps, acc_rate_sum, acc_rate_cnt, hist) = s

        # --- draft: width iid candidates, gamma tokens each ---
        draft_cache = rollback(draft_cache, cur_len - 2)
        first_in = jax.lax.dynamic_slice(tokens, (0, cur_len - 2), (1, 2))
        first_in = jnp.broadcast_to(first_in, (w, 2))
        logits, draft_cache = bundle_d.forward(params_d, cfg_d, first_in, draft_cache)
        q0 = dist_norm(logits[:, -1], scfg)  # rows [w] (dense [w,V] or sparse [w,k])
        key, k0 = jax.random.split(key)
        x0 = dist_sample(k0, q0)  # [w]

        def dstep(carry, _):
            cache, last_tok, key = carry
            logits, cache = bundle_d.forward(params_d, cfg_d, last_tok[:, None], cache)
            q = dist_norm(logits[:, 0], scfg)
            key, ks = jax.random.split(key)
            x = dist_sample(ks, q)
            return (cache, x, key), (q, x)

        def _stack0(a, rest):
            return jax.tree.map(
                lambda x0, xr: jnp.concatenate([x0[None], xr], axis=0), a, rest)

        if gamma > 1:
            (draft_cache, _, key), (q_rest, x_rest) = jax.lax.scan(
                dstep, (draft_cache, x0, key), None, length=gamma - 1
            )
            q_stack = _stack0(q0, q_rest)  # [gamma, w, ...]
            cand = jnp.concatenate([x0[None], x_rest], axis=0)  # [gamma, w]
        else:
            q_stack = jax.tree.map(lambda x: x[None], q0)
            cand = x0[None]
        q_stack = jax.tree.map(lambda x: x.transpose(1, 0, 2), q_stack)  # [w, gamma, ...]
        cand = cand.T  # [w, gamma]

        # --- verify: one batched target forward over all candidates ---
        target_cache = rollback(target_cache, cur_len - 1)
        last_committed = jax.lax.dynamic_slice(tokens, (0, cur_len - 1), (1, 1))
        vin = jnp.concatenate([jnp.broadcast_to(last_committed, (w, 1)), cand], axis=1)
        logits, target_cache = bundle_t.forward(params_t, cfg_t, vin, target_cache)
        p_stack = dist_norm(logits, scfg)  # [w, gamma+1, ...]

        # --- accept: vectorized over width x gamma (:1612-1640) ---
        q_sel = dist_prob_of(q_stack, cand)  # [w, gamma]
        p_head = jax.tree.map(lambda x: x[:, :gamma], p_stack)
        p_sel = dist_prob_of(p_head, cand)
        ratio = jnp.minimum(p_sel / q_sel, 1.0)
        key, kr, kt = jax.random.split(key, 3)
        r = fixed_r if fixed_r is not None else jax.random.uniform(kr, (w, gamma))
        accept = r < ratio  # reference uses strict '<' here (:1625)
        lead = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        cur_l = jnp.sum(lead, axis=1)  # [w]
        choice = jnp.argmax(cur_l)  # first max (reference's strict '>')
        max_l = cur_l[choice]
        all_acc = max_l == gamma
        n = cur_len - 1 + max_l  # absolute accepted end position

        # commit winner tokens then the extra sample
        win = cand[choice]  # [gamma]
        tokens = jax.lax.dynamic_update_slice(tokens, win[None], (0, cur_len))
        q_choice = jax.tree.map(lambda x: x[choice], q_stack)
        p_choice = jax.tree.map(lambda x: x[choice], p_stack)
        q_pad = dist_pad_zero_rows(q_choice, 1)
        p_n = dist_take(p_choice, max_l)
        q_l = dist_take(q_pad, max_l)
        resid = dist_residual(p_n, q_l)
        # reference falls back to sampling p when the residual is degenerate
        # (:1660-1664); max_fn's eps already yields a valid distribution, and
        # sample()'s zero-prob guard resolves the degenerate case to argmax(p-q)=argmax p region.
        if isinstance(resid, TopKDist):
            degenerate = jnp.sum(resid.probs) < 1e-6
            resid = TopKDist(
                jnp.where(degenerate, p_n.idx, resid.idx),
                jnp.where(degenerate, p_n.probs, resid.probs))
            t_res = dist_sample(kt, resid)
            t_bonus = dist_sample(kt, dist_take(p_choice, gamma))
        else:
            resid = jnp.where(jnp.sum(resid) < 1e-6, p_n, resid)
            t_res = sample(kt, resid[None])[0]
            t_bonus = sample(kt, p_stack[choice, gamma][None])[0]
        t = jnp.where(all_acc, t_bonus, t_res)
        new_len = cur_len + max_l + 1
        tokens = jax.lax.dynamic_update_slice(tokens, t[None, None], (0, new_len - 1))

        # re-broadcast the winning row into all cache rows (:1647-1674)
        sel = jnp.full((w,), choice, jnp.int32)
        draft_cache = select_rows(draft_cache, sel)
        target_cache = select_rows(target_cache, sel)

        pos = jnp.arange(tokens.shape[1])
        new_mask = (pos >= cur_len) & (pos < new_len)
        done = jnp.any(new_mask & (tokens[0] == eos_token_id))

        # acc_rate over all width*gamma drafted tokens, q==0 counts as 0 (:1593-1602)
        rate = jnp.where(q_sel > 0, ratio, 0.0)
        hist = jax.lax.dynamic_update_slice(hist, max_l[None], (steps,))
        return (
            tokens, new_len, draft_cache, target_cache, key, done,
            accepted + max_l, steps + 1,
            acc_rate_sum + jnp.sum(rate), acc_rate_cnt + w * gamma, hist,
        )

    state = (
        tokens, prompt_len, draft_cache, target_cache, key, jnp.asarray(False),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
        jnp.zeros((max_new_tokens,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    return out[0], out[1], out[6], out[7], out[8], out[9], out[10]


def multi_speculative_generate(
    bundle_d: ModelBundle,
    params_d,
    bundle_t: ModelBundle,
    params_t,
    prompt,
    max_new_tokens: int,
    *,
    gamma: int = 4,
    width: int = 4,
    strategy: str = "iid",
    num_beams: Optional[int] = None,
    eos_token_id: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    random_seed: Optional[int] = None,
    details: bool = False,
    tp_mesh=None,
):
    """Multi-candidate speculative sampling. ``strategy='iid'`` here;
    'beam' delegates to the beam-draft engine; 'diverse' raises like the
    reference (:1510-1511). ``random_seed`` reproduces the reference's
    reseed-before-every-accept-draw quirk (:1619-1621): all r draws in a
    run equal one fixed uniform."""
    if strategy == "diverse":
        raise NotImplementedError("diverse strategy (reference :1510)")
    if strategy in ("beam", "acc_beam"):
        from .beam_spec import multi_beam_generate

        return multi_beam_generate(
            bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens,
            gamma=gamma, width=width, num_beams=num_beams or max(4, width),
            eos_token_id=eos_token_id, temperature=temperature,
            top_k=top_k, top_p=top_p, key=key, random_seed=random_seed,
            details=details, tp_mesh=tp_mesh,
        )
    if strategy != "iid":
        raise RuntimeError("Strategy not implemented " + strategy)

    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    if p_len < 2:
        raise ValueError("prompt must have at least 2 tokens")
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + gamma + 1)

    fixed_r = None
    if random_seed is not None:
        fixed_r = jnp.broadcast_to(
            jax.random.uniform(jax.random.key(random_seed), ()), (width, gamma))

    t0 = time.perf_counter()
    (tokens, cur_len, accepted, steps, rate_sum, rate_cnt,
     acc_len_hist) = _multi_device(
        params_d, params_t, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        fixed_r,
        bundle_d=bundle_d, bundle_t=bundle_t, gamma=gamma, width=width,
        max_new_tokens=max_new_tokens, scfg=scfg, eos_token_id=eos_token_id,
        max_total_len=max_total,
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
        "accepted_count": int(accepted),
        "acc_rate": float(rate_sum) / max(int(rate_cnt), 1),
        "target_call_times": steps_i,
        "approx_call_times": steps_i,
        "tokens_generated": len(out) - p_len,
        "tokens_per_s": (len(out) - p_len) / wall if wall > 0 else float("nan"),
    }
    fill_phase_split(
        d, wall, steps_i, bundle_d, params_d, bundle_t, params_t,
        draft_rows=width, verify_rows=width, gamma=gamma,
        verify_tokens=gamma + 1, max_total=max_total,
    )
    return out, d
