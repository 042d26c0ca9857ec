"""Beam-drafted speculative algorithms (L3): multi-beam and MJSD.

Capability parity:
  * ``multi_speculative_sampling(strategy='beam')`` — reference
    /root/reference/sampling/speculative_sampling.py:1448-1491 + the shared
    verification loop :1593-1676: the draft proposes ``width`` beam-sampled
    candidates; each is verified token-by-token with r < min(1, p/q) where
    q is the draft's *per-beam* normalized distribution along the path
    (reference out['scores']); the longest leading-accepted candidate wins;
    reject resamples ``max_fn(p - q)``, full accept bonus-samples.
  * ``mjsd_speculative_sampling`` — reference :1117-1376 (multi-token JOINT
    speculative decoding): candidates are scored by the *cumulative joint*
    ratio exp(sum_i log p_i)/seq_q_i against a fixed ``accept_thres``
    (:1277-1310, the active code path: r = accept_thres, acceptance at the
    LAST index whose cumulative ratio clears the threshold, non-contiguous
    allowed); the longest accepted candidate wins; reject samples
    ``max_fn(p_n)`` (plain target dist, :1332), full accept bonus-samples.

TPU design: one fused step = beam_draft (lax.scan) + ONE batched target
verify forward + vectorized candidate scoring; winner row re-broadcast by a
static gather; outer lax.while_loop. Committed-path k/v never need cache
snapshots: the winner's path is a stored cache row, and the boundary
position is idempotently re-derived by the next step's windows.
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
    dist_prob_of,
    dist_sample,
    dist_take,
    max_fn,
    sample,
    use_sparse,
)
from .beam_draft import beam_draft, top_width
from .phases import fill_phase_split
from .types import aligned_total, ModelBundle, first_eos_truncate, pad_prompt


def _leading_accept(key, p_sel, q_sel, fixed_r=None):
    """multi-beam rule (:1612-1640): leading run of r < min(1, p/q)."""
    w, gamma = p_sel.shape
    ratio = jnp.minimum(p_sel / (q_sel + 1e-20), 1.0)
    r = fixed_r if fixed_r is not None else jax.random.uniform(key, (w, gamma))
    lead = jnp.cumprod((r < ratio).astype(jnp.int32), axis=1)
    return jnp.sum(lead, axis=1)  # [w]


def _mjsd_accept(accept_thres, p_sel, seq_q):
    """MJSD rule (:1277-1310): last index whose cumulative joint ratio
    exp(sum log p)/seq_q clears accept_thres; length = that index + 1."""
    cum_logp = jnp.cumsum(jnp.log(p_sel + 1e-30), axis=1)
    ratio = jnp.minimum(jnp.exp(cum_logp) / (seq_q + 1e-30), 1.0)
    ok = accept_thres <= ratio  # [w, gamma]
    gamma = p_sel.shape[1]
    idx = jnp.arange(1, gamma + 1)
    return jnp.max(jnp.where(ok, idx, 0), axis=1)  # [w]


@partial(
    jax.jit,
    static_argnames=(
        "bundle_d", "bundle_t", "gamma", "width", "num_beams", "max_new_tokens",
        "scfg", "eos_token_id", "max_total_len", "mode", "accept_thres",
        "ref_row_compat",
    ),
)
def _beam_spec_device(
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
    num_beams: int,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
    mode: str,  # "beam" | "mjsd"
    accept_thres: float,
    ref_row_compat: bool = False,
):
    cfg_d, cfg_t = bundle_d.cfg, bundle_t.cfg
    nb, w = num_beams, width
    draft_cache = bundle_d.make_cache(nb, max_total_len)
    target_cache = bundle_t.make_cache(w, max_total_len)

    tokens = jnp.zeros((1, max_total_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded, (0, 0))
    _, draft_cache = bundle_d.forward(
        params_d, cfg_d, jnp.broadcast_to(prompt_padded, (nb, prompt_padded.shape[1])), draft_cache
    )
    _, target_cache = bundle_t.forward(
        params_t, cfg_t, jnp.broadcast_to(prompt_padded, (w, prompt_padded.shape[1])), target_cache
    )

    total = prompt_len + max_new_tokens

    def cond(s):
        return jnp.logical_and(s[1] < total, jnp.logical_not(s[5]))

    def body(s):
        (tokens, cur_len, draft_cache, target_cache, key, done,
         accepted, steps, rate_sum, rate_cnt, hist) = s

        row_tokens = jnp.broadcast_to(tokens, (nb, tokens.shape[1]))
        res = beam_draft(
            bundle_d, params_d, scfg, gamma, nb, row_tokens, cur_len, draft_cache, key
        )
        draft_cache, key = res.cache, res.key
        cand, cand_scores, seq_q, perbeam_q, orig_rows = top_width(res, w)
        # cand [w, gamma]; seq_q [w, gamma]; perbeam_q [w, gamma, V]
        if ref_row_compat:
            # Reference bug-compat (differential-CI mode): finalize sorts
            # the candidate sequences by joint score but hands the verify
            # loop its q buffers in final-beam-ROW order — 'scores' rows
            # are parent-gathered during the draft (kvcache_model.py:914)
            # yet never re-sorted to match the finalize output
            # (:953-1022), and 'seq_scores' rows are never parent-gathered
            # at all (:919-922). Our default path fixes both
            # misalignments (beam_draft.py top_width); this reproduces
            # them so test_ref_differential.py can match the reference's
            # acceptance profile exactly.
            perbeam_q = res.perbeam_probs[:w]
            seq_q = jnp.transpose(res.step_chosen_q)[:w]

        # ---- verify: one batched target forward over the w candidates ----
        target_cache = rollback(target_cache, cur_len - 1)
        last_committed = jax.lax.dynamic_slice(tokens, (0, cur_len - 1), (1, 1))
        vin = jnp.concatenate([jnp.broadcast_to(last_committed, (w, 1)), cand], axis=1)
        logits, target_cache = bundle_t.forward(params_t, cfg_t, vin, target_cache)
        p_stack = dist_norm(logits, scfg)  # [w, gamma+1, ...] dense or sparse

        widx = jnp.arange(w)[:, None]
        gidx = jnp.arange(gamma)[None, :]
        p_head = jax.tree.map(lambda x: x[:, :gamma], p_stack)
        p_sel = dist_prob_of(p_head, cand)  # [w, gamma]

        key, kacc, kt = jax.random.split(key, 3)
        if mode == "beam":
            q_sel = perbeam_q[widx, gidx, cand]
            lens = _leading_accept(kacc, p_sel, q_sel, fixed_r)
            rate = jnp.minimum(p_sel / (q_sel + 1e-20), 1.0)
        else:
            lens = _mjsd_accept(accept_thres, p_sel, seq_q)
            cum_logp = jnp.cumsum(jnp.log(p_sel + 1e-30), axis=1)
            rate = jnp.minimum(jnp.exp(cum_logp) / (seq_q + 1e-30), 1.0)

        choice = jnp.argmax(lens)
        max_l = lens[choice]
        all_acc = max_l == gamma

        win = cand[choice]
        tokens = jax.lax.dynamic_update_slice(tokens, win[None], (0, cur_len))

        p_choice = jax.tree.map(lambda x: x[choice], p_stack)
        p_l = dist_take(p_choice, max_l)  # dist at first unaccepted pos
        if use_sparse(scfg):
            if mode == "beam":
                # q is the dense per-beam draft dist; the residual's support
                # is p_l's, so only q's mass at p_l.idx matters
                q_pad = jnp.concatenate(
                    [perbeam_q[choice], jnp.zeros((1, cfg_t.vocab_size))], axis=0)
                q_l = jnp.take(q_pad, max_l, axis=0)
                q_at_p = jnp.take(q_l, p_l.idx)
                wres = jnp.maximum(p_l.probs - q_at_p, 0.0)
                rp = wres / (jnp.sum(wres) + 1e-6)
                rp = jnp.where(jnp.sum(rp) < 1e-6, p_l.probs, rp)
                resid = TopKDist(p_l.idx, rp)
            else:
                # max_fn(p) == p / (1 + eps) on p's own support (:1332)
                resid = TopKDist(p_l.idx, max_fn(p_l.probs))
            t_res = dist_sample(kt, resid)
            t_bonus = dist_sample(kt, dist_take(p_choice, gamma))
        else:
            if mode == "beam":
                q_pad = jnp.concatenate(
                    [perbeam_q[choice], jnp.zeros((1, cfg_t.vocab_size))], axis=0)
                q_l = jnp.take(q_pad, max_l, axis=0)
                resid = max_fn(p_l - q_l)
                resid = jnp.where(jnp.sum(resid) < 1e-6, p_l, resid)
            else:
                resid = max_fn(p_l)  # reference :1332 samples max_fn(p), not p-q
            t_res = sample(kt, resid[None])[0]
            t_bonus = sample(kt, p_stack[choice, gamma][None])[0]
        t = jnp.where(all_acc, t_bonus, t_res)
        new_len = cur_len + max_l + 1
        tokens = jax.lax.dynamic_update_slice(tokens, t[None, None], (0, new_len - 1))

        # winner row re-broadcast (reference rollback(..., choice))
        draft_cache = select_rows(draft_cache, jnp.full((nb,), orig_rows[choice], jnp.int32))
        target_cache = select_rows(target_cache, jnp.full((w,), choice, jnp.int32))

        pos = jnp.arange(tokens.shape[1])
        new_mask = (pos >= cur_len) & (pos < new_len)
        done = jnp.any(new_mask & (tokens[0] == eos_token_id))

        hist = jax.lax.dynamic_update_slice(hist, max_l[None], (steps,))
        return (
            tokens, new_len, draft_cache, target_cache, key, done,
            accepted + max_l, steps + 1,
            rate_sum + jnp.sum(rate), rate_cnt + w * gamma, hist,
        )

    state = (
        tokens, prompt_len, draft_cache, target_cache, key, jnp.asarray(False),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
        jnp.zeros((max_new_tokens,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    return out[0], out[1], out[6], out[7], out[8], out[9], out[10]


def _run(
    mode, bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma, width, num_beams, accept_thres, eos_token_id,
    temperature, top_k, top_p, key, details, random_seed=None, tp_mesh=None,
    ref_row_compat=False,
):
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    if p_len < 2:
        raise ValueError("prompt must have at least 2 tokens")
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + gamma + 1)

    fixed_r = None
    if random_seed is not None and mode == "beam":
        # reference reseeds before every accept draw (:1619-1621) => all r
        # equal one fixed uniform. mjsd's active path uses r = accept_thres
        # (:1288) so random_seed has no effect there, like the reference.
        fixed_r = jnp.broadcast_to(
            jax.random.uniform(jax.random.key(random_seed), ()), (width, gamma))

    t0 = time.perf_counter()
    (tokens, cur_len, accepted, steps, rate_sum, rate_cnt,
     acc_len_hist) = _beam_spec_device(
        params_d, params_t, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        fixed_r,
        bundle_d=bundle_d, bundle_t=bundle_t, gamma=gamma, width=width,
        num_beams=num_beams, max_new_tokens=max_new_tokens, scfg=scfg,
        eos_token_id=eos_token_id, max_total_len=max_total, mode=mode,
        accept_thres=float(accept_thres), ref_row_compat=ref_row_compat,
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
        draft_rows=num_beams, verify_rows=width, gamma=gamma,
        verify_tokens=gamma + 1, max_total=max_total,
    )
    return out, d


def multi_beam_generate(
    bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma: int = 4, width: int = 4, num_beams: Optional[int] = None,
    eos_token_id: int, temperature: float = 1.0, top_k: int = 0,
    top_p: float = 0.0, key=None, random_seed=None, details: bool = False,
    tp_mesh=None, ref_row_compat: bool = False,
):
    """multi_speculative_sampling(strategy='beam') equivalent.

    ``ref_row_compat=True`` reproduces the reference's q-buffer row
    misalignment (see _beam_spec_device) — differential-CI mode only."""
    return _run(
        "beam", bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens,
        gamma=gamma, width=width, num_beams=num_beams or max(4, width),
        accept_thres=0.0, eos_token_id=eos_token_id, temperature=temperature,
        top_k=top_k, top_p=top_p, key=key, random_seed=random_seed,
        details=details, tp_mesh=tp_mesh, ref_row_compat=ref_row_compat,
    )


def mjsd_generate(
    bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma: int = 4, width: int = 8, num_beams: int = 8, accept_thres: float = 0.1,
    eos_token_id: int, temperature: float = 1.0, top_k: int = 0,
    top_p: float = 0.0, key=None, random_seed=None, details: bool = False,
    tp_mesh=None, ref_row_compat: bool = False,
):
    """mjsd_speculative_sampling equivalent (multi-token joint accept).

    ``random_seed`` is accepted for signature parity; the reference's
    active accept path uses the deterministic ``r = accept_thres``
    (:1288) — its reseed sits before a commented-out draw (:1286-1288) —
    so the seed has no observable effect, here or there."""
    return _run(
        "mjsd", bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens,
        gamma=gamma, width=width, num_beams=num_beams, accept_thres=accept_thres,
        eos_token_id=eos_token_id, temperature=temperature,
        top_k=top_k, top_p=top_p, key=key, random_seed=random_seed,
        details=details, tp_mesh=tp_mesh, ref_row_compat=ref_row_compat,
    )
