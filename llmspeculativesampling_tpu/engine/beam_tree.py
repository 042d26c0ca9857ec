"""Beam speculative sampling over token trees (L3) — the flagship pair.

Capability parity:
  * ``beam_speculative_sampling`` — reference
    /root/reference/sampling/speculative_sampling.py:585-1114 ("v1"): the
    draft beam-samples gamma steps; EVERY intermediate beam level is
    verified against the target in one call (the reference flattens all
    levels into a (gamma+1)*B-row batch with ``copy_cache_index``,
    :703-729; here the SAME distributions come from one tree-attention
    forward — mathematically identical, far less compute); the per-level
    accept test ``p/(q+1e-5) > rand()-1`` (:845-847) — which by
    construction always accepts — rescores the beams with target joint
    scores and finally resamples ``num_beams`` continuations from the
    warped target joint (:898-1027). Maintains num_beams parallel
    committed prefixes with EOS candidate collection (:1040-1114).
  * ``beam_speculative_sampling_v2`` — reference :18-581 (the flagship):
    same tree draft, but verification picks a DYNAMIC width via the
    acceptance DP (``get_num_acc_prob`` -> ``expect_cnt``, :254-267), then
    walks the beams sequentially, accepting with ``p/(q+1e-6) > r`` and
    updating the residual joint ``max_fn(p - q)`` on each reject
    (:277-303); extra continuations are resampled from the level joint /
    residual (:344-485); the target cache is compacted to the accepted
    tree paths (:402,485 — rollback_tree_attention) and the draft cache is
    restored per accepted path (:490-494 — beam_rollback from snapshots).

TPU re-design highlights (SURVEY.md §7.3):
  * Host-built ragged tree masks (utils.py:95-148) become a static
    [N+1, N+1] ancestor matrix (N = gamma*num_beams) built from the
    parent pointers — one forward verifies anchor + all tree nodes.
  * ``rollback_tree_attention`` is a static ``take_along_axis`` path
    compaction (cache.kvcache.compact_tree_paths).
  * The reference's per-step full-cache snapshots (beam_past_key_values)
    are replaced by capturing each draft step's *written* k/v slice and
    rebuilding accepted paths with an ancestor gather (beam_draft
    capture_kv) — O(gamma * B) vectors instead of gamma full caches.
  * Sequential accept walks are lax.scan's over the (static) beam count;
    everything else is where-masked; the whole generation is one program.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import KVCache, compact_tree_paths, rollback, select_rows
from ..ops.dp import acceptance_alphas, get_expect_cnt_by_thres, num_accept_distribution
from ..ops.sampling import (
    SamplingConfig,
    TopKDist,
    dist_norm,
    acceptance_alphas_topk,
    joint_topk_from_dists,
    max_fn,
    norm_logits,
    norm_logits_topk,
    prob_of_topk,
    residual_topk,
    rewarp_topk,
    sample,
    sample_k,
    sample_k_topk,
    sample_topk,
    use_sparse,
)
from .beam_draft import beam_draft
from .phases import fill_phase_split
from .types import aligned_total, ModelBundle, pad_prompt

_NEG = -1e30


# --------------------------------------------------------------- tree core
def ancestor_matrix(step_beam_idx: jax.Array, gamma: int, b: int) -> jax.Array:
    """A [N, N] bool, N=gamma*b: A[j1, j2] <=> node j2 is ancestor-or-self
    of node j1 (node (s, beam) has flat id s*b + beam).

    Replaces the host-list mask builder get_seq_att_mask (utils.py:95-148).
    """
    n = gamma * b
    rows = []
    prev = None
    for s in range(gamma):
        self_hot = jax.nn.one_hot(s * b + jnp.arange(b), n, dtype=bool)
        if s == 0:
            anc = self_hot
        else:
            anc = prev[step_beam_idx[s]] | self_hot
        rows.append(anc)
        prev = anc
    return jnp.concatenate(rows, axis=0)


def tree_verify(
    bundle, params, scfg, gamma, num_beams,
    row_tokens, cur_len, cache, node_tokens, node_roots, anc,
):
    """One tree-attention target forward over [anchor] + N nodes.

    Returns (p_root [R, V], p_nodes [N, V], cache): warped per-row
    distributions — p_root[r] conditions on committed row r; p_nodes[j]
    conditions on node j's path (gathered from batch row node_roots[j],
    mirroring forward_tree_attention's gather_pos, kvcache_model.py:133-135).
    """
    r_rows = row_tokens.shape[0]
    n = gamma * num_beams
    cache = rollback(cache, cur_len - 1)
    anchor = jax.lax.dynamic_slice(row_tokens, (0, cur_len - 1), (r_rows, 1))
    vin = jnp.concatenate([anchor, jnp.broadcast_to(node_tokens[None], (r_rows, n))], axis=1)

    # block mask [N+1, N+1]: anchor visible to all, nodes see ancestors
    block = jnp.zeros((n + 1, n + 1), bool)
    block = block.at[:, 0].set(True)
    block = block.at[1:, 1:].set(anc)
    block = jnp.broadcast_to(block[None], (r_rows, n + 1, n + 1))

    node_s = jnp.repeat(jnp.arange(gamma, dtype=jnp.int32), num_beams)  # level of node j
    positions = jnp.concatenate([(cur_len - 1)[None], cur_len + node_s])
    positions = jnp.broadcast_to(positions[None], (r_rows, n + 1))

    logits, cache = bundle.forward(
        params, bundle.cfg, vin, cache, positions=positions, tree_mask=block
    )
    if use_sparse(scfg):
        # sparse rows: [R/N, k] candidate (ids, probs) — never a [.., V]
        # softmax/sort (ops/sampling.py sparse-joint rationale); dist_norm
        # routes vocab-sharded logits through the distributed top-k
        d = dist_norm(logits, scfg)  # idx/probs [R, N+1, k]
        rr = jnp.clip(node_roots, 0, r_rows - 1)
        cols = jnp.arange(n) + 1
        p_root = TopKDist(d.idx[:, 0], d.probs[:, 0])
        p_nodes = TopKDist(d.idx[rr, cols], d.probs[rr, cols])
        return p_root, p_nodes, cache
    probs = norm_logits(logits, scfg)  # [R, N+1, V]
    p_root = probs[:, 0]
    p_nodes = probs[jnp.clip(node_roots, 0, r_rows - 1), jnp.arange(n) + 1]
    return p_root, p_nodes, cache


def backtrack_path(step_beam_idx, step_next_tok, parent, level_end, gamma, b):
    """From a parent row at level ``level_end-1``, walk parent pointers
    back to the root. Returns (path_rows [gamma], path_tokens [gamma],
    path_nodes [gamma], root) — entries at s >= level_end are junk
    (masked by callers); when level_end==0 ``parent`` is already a root row."""
    rows = [jnp.zeros((), jnp.int32)] * gamma
    cur = parent
    for s in range(gamma - 1, -1, -1):
        # only levels below level_end are real; walk lazily with selects
        on = s <= level_end - 1
        rows[s] = jnp.where(on, cur, 0)
        cur = jnp.where(on, step_beam_idx[s][jnp.clip(cur, 0, b - 1)], cur)
    path_rows = jnp.stack(rows)
    path_tokens = jnp.take_along_axis(step_next_tok, path_rows[:, None], axis=1)[:, 0]
    path_nodes = jnp.arange(gamma, dtype=jnp.int32) * b + path_rows
    root = cur  # after walking below level 0 this is the root row
    return path_rows, path_tokens, path_nodes, root


# ------------------------------------------------------------ shared state
class TreeState(NamedTuple):
    row_tokens: jax.Array   # [R, T] committed parallel prefixes
    cur_len: jax.Array
    draft_cache: KVCache    # committed draft cache (B rows, slot pattern)
    target_cache: KVCache   # committed target cache (R rows)
    beam_scores: jax.Array  # [R] committed row scores (carried in v1)
    key: jax.Array
    done: jax.Array
    first: jax.Array        # bool: v1 first-iteration valid-beam special case
    accepted: jax.Array
    steps: jax.Array
    rate_sum: jax.Array
    rate_cnt: jax.Array
    # best finished candidate (EOS bookkeeping, :1044-1062 / :500-526)
    best_tokens: jax.Array
    best_len: jax.Array
    best_score: jax.Array
    alive: jax.Array        # [R] row not yet EOS-finished this run
    acc_len_hist: jax.Array  # [max_steps] accepted levels per step (:1991 analogue)
    expect_hist: jax.Array   # [max_steps, gamma] v2 per-level expect_cnt (-1 inactive)


def _slot_pattern(b, r):
    return jnp.minimum(jnp.arange(b), r - 1).astype(jnp.int32)


def _commit(
    state: TreeState, res, t_flat, max_l,
    gamma, num_beams, r_slots, vocab, new_scores_full,
):
    """Commit R slots: tokens, target tree compaction, draft rebuild.

    ``state.draft_cache`` must be the PRE-draft committed cache (its rows
    follow the slot pattern), not the reordered beam_draft output — the
    rebuild selects committed prefix rows from it and overlays the
    captured anchor/node k/v of the accepted paths."""
    b = num_beams
    cur_len = state.cur_len
    parent = (t_flat // vocab).astype(jnp.int32)[:r_slots]  # [R]
    token = (t_flat % vocab).astype(jnp.int32)[:r_slots]

    bt_fn = lambda p: backtrack_path(res.step_beam_idx, res.step_next_tok, p, max_l, gamma, b)
    path_rows, path_tokens, path_nodes, roots = jax.vmap(bt_fn)(parent)
    # when max_l == 0 the "parent" indexes roots directly
    roots = jnp.where(max_l == 0, jnp.clip(parent, 0, r_slots - 1), roots)
    roots = jnp.clip(roots, 0, r_slots - 1)

    # --- tokens ---
    svalid = jnp.arange(gamma) < max_l  # [gamma]
    new_rows = state.row_tokens[roots]
    tail = jnp.where(svalid[None], path_tokens, 0)
    cur_tail = jax.lax.dynamic_slice(new_rows, (0, cur_len), (r_slots, gamma))
    new_rows = jax.lax.dynamic_update_slice(
        new_rows, jnp.where(svalid[None], tail, cur_tail), (jnp.zeros((), jnp.int32), cur_len)
    )
    new_len = cur_len + max_l + 1
    new_rows = jax.lax.dynamic_update_slice(
        new_rows, token[:, None], (jnp.zeros((), jnp.int32), new_len - 1)
    )

    # --- target cache: row-select by root, compact accepted path ---
    tc = select_rows(state.target_cache, roots)
    # node j sits at cache position cur_len + j (anchor at cur_len-1)
    tc = compact_tree_paths(tc, path_nodes, jnp.broadcast_to(svalid[None], (r_slots, gamma)), cur_len)
    tc = rollback(tc, cur_len + max_l)

    # --- draft cache rebuild: committed rows by root + anchor/node k/v ---
    rows_map = roots[_slot_pattern(b, r_slots)]  # [B] (values < r_slots)
    dc = select_rows(state.draft_cache, rows_map)
    ak, av = res.anchor_kv  # [L, B, H, 2, D] in initial (slot-pattern) arrangement
    zero = jnp.zeros((), jnp.int32)
    ak = ak[:, rows_map]  # initial row r == committed row r for r < r_slots
    av = av[:, rows_map]
    k = jax.lax.dynamic_update_slice(dc.k, ak.astype(dc.k.dtype), (zero, zero, zero, cur_len - 2, zero))
    v = jax.lax.dynamic_update_slice(dc.v, av.astype(dc.v.dtype), (zero, zero, zero, cur_len - 2, zero))
    if res.node_kv is not None and gamma > 1:
        nk, nv = res.node_kv  # [gamma-1, L, B, H, D]
        # gather the path: entry s (< gamma-1) = node (s, path_rows[slot, s])
        pr = path_rows[_slot_pattern(b, r_slots)]  # [B, gamma]
        gk = []
        gv = []
        for s in range(gamma - 1):
            gk.append(nk[s][:, pr[:, s]])  # [L, B, H, D]
            gv.append(nv[s][:, pr[:, s]])
        gk = jnp.stack(gk, axis=3)  # [L, B, H, gamma-1, D]
        gv = jnp.stack(gv, axis=3)
        valid_kv = (jnp.arange(gamma - 1) < jnp.minimum(max_l, gamma - 1))[None, None, None, :, None]
        cur_k = jax.lax.dynamic_slice(
            k, (zero, zero, zero, cur_len, zero),
            (k.shape[0], k.shape[1], k.shape[2], gamma - 1, k.shape[4]),
        )
        cur_v = jax.lax.dynamic_slice(
            v, (zero, zero, zero, cur_len, zero),
            (v.shape[0], v.shape[1], v.shape[2], gamma - 1, v.shape[4]),
        )
        gk = jnp.where(valid_kv, gk.astype(k.dtype), cur_k)
        gv = jnp.where(valid_kv, gv.astype(v.dtype), cur_v)
        k = jax.lax.dynamic_update_slice(k, gk, (zero, zero, zero, cur_len, zero))
        v = jax.lax.dynamic_update_slice(v, gv, (zero, zero, zero, cur_len, zero))
    dc = KVCache(k, v, jnp.maximum(cur_len + max_l - 1, 2))

    return state._replace(
        row_tokens=new_rows, cur_len=new_len, draft_cache=dc,
        target_cache=tc, beam_scores=new_scores_full,
    ), token


def _eos_bookkeeping(state: TreeState, eos_token_id, prompt_len, r_slots):
    """Candidate collection + termination (:1044-1062 / :500-526)."""
    seqs = state.row_tokens
    cur_len = state.cur_len
    pos = jnp.arange(seqs.shape[1])
    gen_mask = (pos[None] >= prompt_len) & (pos[None] < cur_len)
    has_eos = jnp.any(gen_mask & (seqs == eos_token_id), axis=1)  # [R]
    # first EOS position per row (for candidate length)
    eos_hits = gen_mask & (seqs == eos_token_id)
    first_eos = jnp.argmax(eos_hits, axis=1)
    cand_len = jnp.where(has_eos, first_eos + 1, cur_len)
    scores_r = state.beam_scores[:seqs.shape[0]]
    norm_score = scores_r / jnp.maximum(cand_len - prompt_len, 1).astype(jnp.float32)
    cand_score = jnp.where(has_eos & state.alive, norm_score, _NEG)
    cb = jnp.argmax(cand_score)
    improved = cand_score[cb] > state.best_score
    best_tokens = jnp.where(improved, seqs[cb], state.best_tokens)
    best_len = jnp.where(improved, cand_len[cb], state.best_len)
    best_score = jnp.where(improved, cand_score[cb], state.best_score)
    alive = state.alive & jnp.logical_not(has_eos)
    done = jnp.logical_not(jnp.any(alive))
    if r_slots == 1:
        done = has_eos[0]
    return state._replace(
        best_tokens=best_tokens, best_len=best_len, best_score=best_score,
        alive=alive, done=state.done | done,
    )


# ------------------------------------------------------------------ walks
def _v2_walk(
    scfg, gamma, num_beams, vocab, expect_thres, min_num_beams,
    res, p_root, p_nodes, r_slots, key,
):
    """Dynamic-width DP walk (reference :188-337). Returns accept context."""
    b = num_beams
    key, kr = jax.random.split(key)
    rmat = jax.random.uniform(kr, (gamma, b))

    active = jnp.asarray(True)
    max_l = jnp.zeros((), jnp.int32)
    valid = jnp.arange(b) < r_slots
    beam_scores = jnp.zeros((b,), jnp.float32)
    # captured fail-level context
    f_p_next = jnp.zeros((b * vocab,), jnp.float32)
    f_resid = jnp.zeros((b * vocab,), jnp.float32)
    f_sample_idx = jnp.zeros((b,), jnp.int32)
    f_accept = jnp.zeros((b,), bool)
    f_acc_cnt = jnp.zeros((), jnp.int32)
    rate_sum = jnp.zeros((), jnp.float32)
    expect_levels = []  # per-level expect_cnt while active, -1 after fail

    last_p_next = jnp.zeros((b * vocab,), jnp.float32)

    for i in range(gamma):
        parent_idx = res.step_beam_idx[i]  # [b]
        if i == 0:
            cur_p = jnp.concatenate(
                [p_root, jnp.zeros((b - r_slots, vocab), p_root.dtype)], axis=0
            ) if r_slots < b else p_root[:b]
        else:
            cur_p = p_nodes[(i - 1) * b : i * b]
        from_valid = valid[parent_idx]
        logj = jnp.where(valid[:, None], jnp.log(cur_p + 1e-30) + beam_scores[:, None], _NEG)
        p_next = norm_logits(logj.reshape(1, -1), scfg)[0]  # [b*V] warped (:231)
        q_prob = jnp.where(valid[:, None], res.step_joint_q[i].reshape(b, vocab), 0.0).reshape(-1)
        sample_idx = parent_idx * vocab + res.step_next_tok[i]
        q_scores = res.step_chosen_q[i]

        # dynamic width via the acceptance DP (:254-267)
        alphas = acceptance_alphas(p_next, q_prob, b)
        probs_k, expect = num_accept_distribution(alphas, b)
        p_width = jnp.concatenate([probs_k[1:], probs_k[:1]])  # reference layout
        if expect_thres < 0:
            expect_cnt = jnp.floor(expect).astype(jnp.int32)
        else:
            expect_cnt = get_expect_cnt_by_thres(p_width, expect_thres)
        expect_cnt = jnp.maximum(expect_cnt, min_num_beams)
        expect_levels.append(jnp.where(active, expect_cnt, -1))

        # sequential accept over beams with residual updates (:277-303)
        def bstep(carry, j):
            cur_prob, acc_cnt, accept = carry
            p_score = cur_prob[sample_idx[j]]
            ok_slots = acc_cnt < expect_cnt
            a = from_valid[j] & ok_slots & (p_score / (q_scores[j] + 1e-6) > rmat[i, j])
            cur_prob = jnp.where(a, p_next, max_fn(cur_prob - q_prob))
            return (cur_prob, acc_cnt + a.astype(jnp.int32), accept.at[j].set(a)), None

        (resid_prob, acc_cnt, accept), _ = jax.lax.scan(
            bstep, (p_next, jnp.zeros((), jnp.int32), jnp.zeros((b,), bool)),
            jnp.arange(b),
        )

        level_ok = acc_cnt >= expect_cnt
        advance = active & level_ok
        fail_now = active & jnp.logical_not(level_ok)

        p_sc = jnp.where(accept, p_next[sample_idx], 0.0)
        beam_scores = jnp.where(advance, jnp.log(p_sc + 1e-30), beam_scores)
        valid = jnp.where(advance, accept, valid)
        max_l = max_l + advance.astype(jnp.int32)
        rate_sum = rate_sum + jnp.where(active, jnp.mean(accept.astype(jnp.float32)), 0.0)

        f_p_next = jnp.where(fail_now, p_next, f_p_next)
        f_resid = jnp.where(fail_now, resid_prob, f_resid)
        f_sample_idx = jnp.where(fail_now, sample_idx, f_sample_idx)
        f_accept = jnp.where(fail_now, accept, f_accept)
        f_acc_cnt = jnp.where(fail_now, acc_cnt, f_acc_cnt)
        last_p_next = jnp.where(advance, p_next, last_p_next)
        active = active & level_ok

    all_acc = active
    # all-accept final joint over the last level's surviving beams (:344-350)
    cur_p = p_nodes[(gamma - 1) * b : gamma * b]
    logj = jnp.where(valid[:, None], jnp.log(cur_p + 1e-30) + beam_scores[:, None], _NEG)
    p_final = norm_logits(logj.reshape(1, -1), scfg)[0]

    # --- resample num_beams continuations (:360-446) ---
    key, k1, k2, k3 = jax.random.split(key, 4)
    t_all = sample_k(k1, p_final[None], num_beams)[0]
    t_fail = sample_k(k2, f_p_next[None], num_beams)[0]
    t_resid = sample(k3, f_resid[None])[0]
    if r_slots == 1:
        # extra_sample_cnt == 1: single draw; partial case from the residual (:446)
        t_partial = t_resid[None].repeat(num_beams)
    else:
        # accepted sample-ids first, one residual draw, rest joint draws (:430-437)
        order = jnp.argsort(jnp.logical_not(f_accept), stable=True)
        acc_sorted = f_sample_idx[order]
        slots = jnp.arange(num_beams)
        t_partial = jnp.where(slots < f_acc_cnt, acc_sorted, t_fail)
        t_partial = jnp.where(slots == f_acc_cnt, t_resid, t_partial)
    t = jnp.where(all_acc, t_all, t_partial)
    score_src = jnp.where(all_acc, p_final, f_p_next)
    new_scores = jnp.log(score_src[t] + 1e-30)[:r_slots]
    return t, max_l, all_acc, new_scores, rate_sum, key, jnp.stack(expect_levels)


def _pad_rows(dist: TopKDist, b: int, r_slots: int) -> TopKDist:
    """[r_slots, k] -> [b, k] with zero-prob padding rows."""
    if r_slots >= b:
        return TopKDist(dist.idx[:b], dist.probs[:b])
    pad = b - r_slots
    k = dist.probs.shape[-1]
    return TopKDist(
        jnp.concatenate([dist.idx, jnp.zeros((pad, k), jnp.int32)]),
        jnp.concatenate([dist.probs, jnp.zeros((pad, k), jnp.float32)]),
    )


def _row_slice(p_nodes: TopKDist, lo: int, hi: int) -> TopKDist:
    return TopKDist(p_nodes.idx[lo:hi], p_nodes.probs[lo:hi])


def _prob_at(dist: TopKDist, flat_ids: jax.Array) -> jax.Array:
    """Probability mass at each flat id ([n] ints) under a flat-candidate
    joint dist ([K])."""
    hit = dist.idx[None, :] == flat_ids[:, None]
    return jnp.sum(jnp.where(hit, dist.probs[None, :], 0.0), axis=-1)


def _v2_walk_sparse(
    scfg, gamma, num_beams, vocab, expect_thres, min_num_beams,
    res, p_root, p_nodes, r_slots, key,
):
    """Sparse (candidate-space) dynamic-width DP walk — same math as
    :func:`_v2_walk` restricted to the joints' top-k supports. All
    per-level state lives on <= top_k candidates instead of [B*V]
    (ops/sampling.py sparse-joint rationale); exact up to the dense path's
    1e-30 log floor on zero-prob entries."""
    b = num_beams
    key, kr = jax.random.split(key)
    rmat = jax.random.uniform(kr, (gamma, b))

    kk = p_root.probs.shape[-1]  # scfg.top_k (verify row width)
    active = jnp.asarray(True)
    max_l = jnp.zeros((), jnp.int32)
    valid = jnp.arange(b) < r_slots
    beam_scores = jnp.zeros((b,), jnp.float32)
    f_dist = TopKDist(jnp.zeros((kk,), jnp.int32), jnp.zeros((kk,), jnp.float32))
    f_resid = jnp.zeros((kk,), jnp.float32)
    f_sample_idx = jnp.zeros((b,), jnp.int32)
    f_accept = jnp.zeros((b,), bool)
    f_acc_cnt = jnp.zeros((), jnp.int32)
    rate_sum = jnp.zeros((), jnp.float32)
    expect_levels = []

    for i in range(gamma):
        parent_idx = res.step_beam_idx[i]
        if i == 0:
            rows = _pad_rows(p_root, b, r_slots)
        else:
            rows = _row_slice(p_nodes, (i - 1) * b, i * b)
        from_valid = valid[parent_idx]
        p_next = joint_topk_from_dists(rows, beam_scores, valid, scfg, vocab)
        qd = res.step_joint_q  # TopKDist [gamma, k] (sparse beam draft)
        q_row = TopKDist(qd.idx[i], jnp.where(
            valid[qd.idx[i] // vocab], qd.probs[i], 0.0))
        sample_idx = parent_idx * vocab + res.step_next_tok[i]
        q_scores = res.step_chosen_q[i]

        alphas = acceptance_alphas_topk(p_next, q_row, b)
        probs_k, expect = num_accept_distribution(alphas, b)
        p_width = jnp.concatenate([probs_k[1:], probs_k[:1]])  # reference layout
        if expect_thres < 0:
            expect_cnt = jnp.floor(expect).astype(jnp.int32)
        else:
            expect_cnt = get_expect_cnt_by_thres(p_width, expect_thres)
        expect_cnt = jnp.maximum(expect_cnt, min_num_beams)
        expect_levels.append(jnp.where(active, expect_cnt, -1))

        # q's mass at p_next's candidates (constant for the level)
        q_at_p = jnp.sum(jnp.where(
            p_next.idx[:, None] == q_row.idx[None, :],
            q_row.probs[None, :], 0.0), axis=-1)
        p_at_samples = _prob_at(p_next, sample_idx)  # [b]

        def bstep(carry, j):
            cur_probs, acc_cnt, accept = carry
            p_score = jnp.sum(jnp.where(
                p_next.idx == sample_idx[j], cur_probs, 0.0))
            ok_slots = acc_cnt < expect_cnt
            a = from_valid[j] & ok_slots & (
                p_score / (q_scores[j] + 1e-6) > rmat[i, j])
            resid = jnp.maximum(cur_probs - q_at_p, 0.0)
            resid = resid / (jnp.sum(resid) + 1e-6)
            cur_probs = jnp.where(a, p_next.probs, resid)
            return (cur_probs, acc_cnt + a.astype(jnp.int32),
                    accept.at[j].set(a)), None

        (resid_probs, acc_cnt, accept), _ = jax.lax.scan(
            bstep, (p_next.probs, jnp.zeros((), jnp.int32),
                    jnp.zeros((b,), bool)),
            jnp.arange(b),
        )

        level_ok = acc_cnt >= expect_cnt
        advance = active & level_ok
        fail_now = active & jnp.logical_not(level_ok)

        p_sc = jnp.where(accept, p_at_samples, 0.0)
        beam_scores = jnp.where(advance, jnp.log(p_sc + 1e-30), beam_scores)
        valid = jnp.where(advance, accept, valid)
        max_l = max_l + advance.astype(jnp.int32)
        rate_sum = rate_sum + jnp.where(
            active, jnp.mean(accept.astype(jnp.float32)), 0.0)

        f_dist = TopKDist(
            jnp.where(fail_now, p_next.idx, f_dist.idx),
            jnp.where(fail_now, p_next.probs, f_dist.probs),
        )
        f_resid = jnp.where(fail_now, resid_probs, f_resid)
        f_sample_idx = jnp.where(fail_now, sample_idx, f_sample_idx)
        f_accept = jnp.where(fail_now, accept, f_accept)
        f_acc_cnt = jnp.where(fail_now, acc_cnt, f_acc_cnt)
        active = active & level_ok

    all_acc = active
    rows = _row_slice(p_nodes, (gamma - 1) * b, gamma * b)
    p_final = joint_topk_from_dists(rows, beam_scores, valid, scfg, vocab)

    key, k1, k2, k3 = jax.random.split(key, 4)
    t_all = sample_k_topk(k1, p_final, num_beams)
    t_fail = sample_k_topk(k2, f_dist, num_beams)
    t_resid = sample_topk(k3, TopKDist(f_dist.idx, f_resid))
    if r_slots == 1:
        # extra_sample_cnt == 1: single draw; partial case from the residual (:446)
        t_partial = t_resid[None].repeat(num_beams)
    else:
        order = jnp.argsort(jnp.logical_not(f_accept), stable=True)
        acc_sorted = f_sample_idx[order]
        slots = jnp.arange(num_beams)
        t_partial = jnp.where(slots < f_acc_cnt, acc_sorted, t_fail)
        t_partial = jnp.where(slots == f_acc_cnt, t_resid, t_partial)
    t = jnp.where(all_acc, t_all, t_partial)
    score = jnp.where(all_acc, _prob_at(p_final, t), _prob_at(f_dist, t))
    new_scores = jnp.log(score + 1e-30)[:r_slots]
    return t, max_l, all_acc, new_scores, rate_sum, key, jnp.stack(expect_levels)


def _v1_walk(scfg, gamma, num_beams, vocab, min_num_beams, res, p_root, p_nodes, state, r_slots, key):
    """Always-accept rescoring walk (reference :772-892 — note r-1 quirk)."""
    b = num_beams
    key, kr = jax.random.split(key)
    rmat = jax.random.uniform(kr, (gamma,)) - 1.0  # :845 — always below any ratio

    active = jnp.asarray(True)
    max_l = jnp.zeros((), jnp.int32)
    first = state.first
    # :772-778 — first outer iteration: only beam 0 valid (all committed
    # rows identical); afterwards every row is valid again (:1040, the EOS
    # markings are overwritten before the next walk).
    valid = jnp.where(first, jnp.arange(b) == 0, jnp.ones((b,), bool))
    beam_scores = jnp.where(first, jnp.zeros((b,)), state.beam_scores)
    f_p_next = jnp.zeros((b * vocab,), jnp.float32)
    rate_sum = jnp.zeros((), jnp.float32)

    for i in range(gamma):
        parent_idx = res.step_beam_idx[i]
        if i == 0:
            parent_idx = jnp.where(first, jnp.zeros_like(parent_idx), parent_idx)  # :797
            cur_p = jnp.concatenate(
                [p_root, jnp.zeros((b - r_slots, vocab), p_root.dtype)], axis=0
            ) if r_slots < b else p_root[:b]
        else:
            cur_p = p_nodes[(i - 1) * b : i * b]
        from_valid = valid[parent_idx]
        logj = jnp.where(valid[:, None], jnp.log(cur_p + 1e-30) + beam_scores[:, None], _NEG)
        p_next = jax.nn.softmax(logj.reshape(-1))  # plain softmax (:826)
        sample_idx = parent_idx * vocab + res.step_next_tok[i]
        p_sc = jnp.where(from_valid, p_next[sample_idx], 0.0)
        accept = (p_sc / (res.step_chosen_q[i] + 1e-5)) > rmat[i]  # :847
        accept = jnp.where(jnp.any(from_valid), accept, from_valid)  # :864-866
        acc_cnt = jnp.sum(accept.astype(jnp.int32))
        level_ok = acc_cnt >= min_num_beams
        advance = active & level_ok
        beam_scores = jnp.where(advance, jnp.log(p_sc + 1e-30), beam_scores)
        valid = jnp.where(advance, accept, valid)
        max_l = max_l + advance.astype(jnp.int32)
        rate_sum = rate_sum + jnp.where(active, jnp.mean(accept.astype(jnp.float32)), 0.0)
        f_p_next = jnp.where(active, p_next, f_p_next)  # last active level joint
        active = active & level_ok

    all_acc = active
    cur_p = p_nodes[(gamma - 1) * b : gamma * b]
    logj = jnp.where(valid[:, None], jnp.log(cur_p + 1e-30) + beam_scores[:, None], _NEG)
    joint = jnp.where(all_acc, logj.reshape(-1), jnp.log(f_p_next + 1e-30))
    p_resample = norm_logits(joint.reshape(1, -1), scfg)[0]  # warped (:908/:975)
    key, kt = jax.random.split(key)
    t = sample_k(kt, p_resample[None], num_beams)[0]
    new_scores = jnp.log(p_resample[t] + 1e-30)[:r_slots]
    return t, max_l, all_acc, new_scores, rate_sum, key


def _v1_walk_sparse(
    scfg, gamma, num_beams, vocab, min_num_beams, res, p_root, p_nodes,
    state, r_slots, key,
):
    """Sparse always-accept rescoring walk — :func:`_v1_walk` restricted
    to the warped rows' candidate support (the plain joint softmax :826
    already has support <= B*k because cur_p is row-warped)."""
    b = num_beams
    key, kr = jax.random.split(key)
    rmat = jax.random.uniform(kr, (gamma,)) - 1.0  # :845 — always below any ratio

    kk = p_root.probs.shape[-1]
    nall = b * kk
    plain = SamplingConfig(1.0, 0, 0.0)  # plain softmax at accept (:826)
    active = jnp.asarray(True)
    max_l = jnp.zeros((), jnp.int32)
    first = state.first
    valid = jnp.where(first, jnp.arange(b) == 0, jnp.ones((b,), bool))
    beam_scores = jnp.where(first, jnp.zeros((b,)), state.beam_scores)
    f_dist = TopKDist(jnp.zeros((nall,), jnp.int32), jnp.zeros((nall,), jnp.float32))
    rate_sum = jnp.zeros((), jnp.float32)

    for i in range(gamma):
        parent_idx = res.step_beam_idx[i]
        if i == 0:
            parent_idx = jnp.where(first, jnp.zeros_like(parent_idx), parent_idx)  # :797
            rows = _pad_rows(p_root, b, r_slots)
        else:
            rows = _row_slice(p_nodes, (i - 1) * b, i * b)
        from_valid = valid[parent_idx]
        p_next = joint_topk_from_dists(
            rows, beam_scores, valid, plain, vocab, out_k=nall)
        sample_idx = parent_idx * vocab + res.step_next_tok[i]
        p_sc = jnp.where(from_valid, _prob_at(p_next, sample_idx), 0.0)
        accept = (p_sc / (res.step_chosen_q[i] + 1e-5)) > rmat[i]  # :847
        accept = jnp.where(jnp.any(from_valid), accept, from_valid)  # :864-866
        acc_cnt = jnp.sum(accept.astype(jnp.int32))
        level_ok = acc_cnt >= min_num_beams
        advance = active & level_ok
        beam_scores = jnp.where(advance, jnp.log(p_sc + 1e-30), beam_scores)
        valid = jnp.where(advance, accept, valid)
        max_l = max_l + advance.astype(jnp.int32)
        rate_sum = rate_sum + jnp.where(active, jnp.mean(accept.astype(jnp.float32)), 0.0)
        f_dist = TopKDist(
            jnp.where(active, p_next.idx, f_dist.idx),
            jnp.where(active, p_next.probs, f_dist.probs),
        )  # last active level joint
        active = active & level_ok

    all_acc = active
    rows = _row_slice(p_nodes, (gamma - 1) * b, gamma * b)
    last = joint_topk_from_dists(rows, beam_scores, valid, plain, vocab, out_k=nall)
    sel = TopKDist(
        jnp.where(all_acc, last.idx, f_dist.idx),
        jnp.where(all_acc, last.probs, f_dist.probs),
    )
    p_resample = rewarp_topk(sel, scfg)  # warped (:908/:975)
    key, kt = jax.random.split(key)
    t = sample_k_topk(kt, p_resample, num_beams)
    new_scores = jnp.log(_prob_at(p_resample, t) + 1e-30)[:r_slots]
    return t, max_l, all_acc, new_scores, rate_sum, key


# ----------------------------------------------------------------- engines
@partial(
    jax.jit,
    static_argnames=(
        "bundle_d", "bundle_t", "gamma", "num_beams", "r_slots", "max_new_tokens",
        "scfg", "eos_token_id", "max_total_len", "mode", "expect_thres", "min_num_beams",
    ),
)
def _beam_tree_device(
    params_d, params_t, prompt_padded, prompt_len, key, *,
    bundle_d, bundle_t, gamma, num_beams, r_slots, max_new_tokens,
    scfg, eos_token_id, max_total_len, mode, expect_thres, min_num_beams,
):
    cfg_d, cfg_t = bundle_d.cfg, bundle_t.cfg
    b = num_beams
    vocab = cfg_t.vocab_size
    total = prompt_len + max_new_tokens

    draft_cache = bundle_d.make_cache(b, max_total_len)
    target_cache = bundle_t.make_cache(r_slots, max_total_len)

    row_tokens = jnp.zeros((r_slots, max_total_len), jnp.int32)
    row_tokens = jax.lax.dynamic_update_slice(
        row_tokens, jnp.broadcast_to(prompt_padded, (r_slots, prompt_padded.shape[1])), (0, 0)
    )
    _, draft_cache = bundle_d.forward(
        params_d, cfg_d, jnp.broadcast_to(prompt_padded, (b, prompt_padded.shape[1])), draft_cache
    )
    _, target_cache = bundle_t.forward(
        params_t, cfg_t, jnp.broadcast_to(prompt_padded, (r_slots, prompt_padded.shape[1])), target_cache
    )

    state = TreeState(
        row_tokens=row_tokens, cur_len=prompt_len, draft_cache=draft_cache,
        target_cache=target_cache, beam_scores=jnp.zeros((b,), jnp.float32),
        key=key, done=jnp.asarray(False), first=jnp.asarray(True),
        accepted=jnp.zeros((), jnp.int32), steps=jnp.zeros((), jnp.int32),
        rate_sum=jnp.zeros((), jnp.float32), rate_cnt=jnp.zeros((), jnp.int32),
        best_tokens=jnp.zeros((max_total_len,), jnp.int32),
        best_len=jnp.zeros((), jnp.int32),
        best_score=jnp.asarray(_NEG, jnp.float32),
        alive=jnp.ones((r_slots,), bool),
        acc_len_hist=jnp.zeros((max_new_tokens,), jnp.int32),
        expect_hist=jnp.full((max_new_tokens, gamma), -1, jnp.int32),
    )

    def cond(s: TreeState):
        return jnp.logical_and(s.cur_len < total, jnp.logical_not(s.done))

    def body(s: TreeState):
        init_scores = jnp.where(jnp.arange(b) < r_slots, 0.0, -jnp.inf)
        res = beam_draft(
            bundle_d, params_d, scfg, gamma, b,
            s.row_tokens[_slot_pattern(b, r_slots)], s.cur_len, s.draft_cache,
            s.key, init_beam_scores=init_scores,
            init_root=_slot_pattern(b, r_slots), capture_kv=True,
        )
        key = res.key

        node_tokens = res.step_next_tok.reshape(-1)  # [N] node (s, b) = s*b+b'
        node_roots = res.step_root.reshape(-1)
        anc = ancestor_matrix(res.step_beam_idx, gamma, b)
        p_root, p_nodes, target_cache = tree_verify(
            bundle_t, params_t, scfg, gamma, b, s.row_tokens, s.cur_len,
            s.target_cache, node_tokens, node_roots, anc,
        )
        # NOTE: draft_cache stays the PRE-draft committed cache for _commit.
        s = s._replace(target_cache=target_cache)

        sparse = use_sparse(scfg)
        if mode == "v2":
            walk = _v2_walk_sparse if sparse else _v2_walk
            t, max_l, all_acc, new_scores, rate_sum, key, expect_levels = walk(
                scfg, gamma, b, vocab, expect_thres, min_num_beams,
                res, p_root, p_nodes, r_slots, key,
            )
        else:
            walk = _v1_walk_sparse if sparse else _v1_walk
            t, max_l, all_acc, new_scores, rate_sum, key = walk(
                scfg, gamma, b, vocab, min_num_beams, res, p_root, p_nodes,
                s, r_slots, key,
            )
            expect_levels = jnp.full((gamma,), -1, jnp.int32)

        full_scores = jnp.zeros((b,), jnp.float32).at[:r_slots].set(new_scores)
        s, _ = _commit(
            s._replace(key=key), res, t, max_l,
            gamma, b, r_slots, vocab, full_scores,
        )
        s = s._replace(
            first=jnp.asarray(False),
            accepted=s.accepted + max_l,
            steps=s.steps + 1,
            rate_sum=s.rate_sum + rate_sum,
            rate_cnt=s.rate_cnt + gamma,
            acc_len_hist=jax.lax.dynamic_update_slice(
                s.acc_len_hist, max_l[None], (s.steps,)),
            expect_hist=jax.lax.dynamic_update_slice(
                s.expect_hist, expect_levels[None].astype(jnp.int32),
                (s.steps, jnp.zeros((), jnp.int32))),
        )
        s = _eos_bookkeeping(s, eos_token_id, prompt_len, r_slots)
        return s

    state = jax.lax.while_loop(cond, body, state)

    # final candidates: surviving rows by normalized score (:536-548)
    norm = state.beam_scores[:r_slots] / jnp.maximum(
        state.cur_len - prompt_len, 1
    ).astype(jnp.float32)
    norm = jnp.where(state.alive, norm, _NEG)
    fb = jnp.argmax(norm)
    improved = norm[fb] > state.best_score
    best_tokens = jnp.where(improved, state.row_tokens[fb], state.best_tokens)
    best_len = jnp.where(improved, state.cur_len, state.best_len)
    return (best_tokens, best_len, state.accepted, state.steps,
            state.rate_sum, state.rate_cnt, state.acc_len_hist,
            state.expect_hist)


def _run_tree(
    mode, bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma, width, num_beams, min_num_beams, extra_sample_cnt, expect_thres,
    eos_token_id, temperature, top_k, top_p, key, details, tp_mesh=None,
):
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    if p_len < 2:
        raise ValueError("prompt must have at least 2 tokens")
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + gamma + num_beams * gamma + 2)

    r_slots = num_beams if mode == "v1" else max(extra_sample_cnt, 1)

    t0 = time.perf_counter()
    (tokens, out_len, accepted, steps, rate_sum, rate_cnt,
     acc_len_hist, expect_hist) = _beam_tree_device(
        params_d, params_t, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        bundle_d=bundle_d, bundle_t=bundle_t, gamma=gamma, num_beams=num_beams,
        r_slots=r_slots, max_new_tokens=max_new_tokens, scfg=scfg,
        eos_token_id=eos_token_id, max_total_len=max_total, mode=mode,
        expect_thres=float(expect_thres), min_num_beams=int(min_num_beams),
    )
    wall = time.perf_counter() - t0
    out = jax.device_get(tokens)[: int(out_len)]
    if not details:
        return out
    steps_i = int(steps)
    # flattened per-level expect counts in step order, active levels only
    # (reference expect_cnt_list, evaluation.py:889 / speculative_sampling.py:270)
    eh2d = jax.device_get(expect_hist)[:steps_i]  # [steps, gamma]
    eh = eh2d.reshape(-1)
    acc_list = jax.device_get(acc_len_hist)[:steps_i].tolist()
    # reference num_beams_list (speculative_sampling.py:322,336 for v2;
    # :875,891 for v1): acc_cnt per advanced level (== expect_cnt there,
    # the :321 assert) + extra_sample_cnt (v2) / num_beams (v1) on the
    # failing level. v2 derives exactly from the expect/acc histories;
    # the fused v1 walk does not capture per-level acc counts, so v1
    # reports num_beams per level (its always-accept r-1 quirk makes
    # acc_cnt == valid-parent count; key kept for schema parity — the
    # reference's own v1 crashes before producing details on most runs).
    nbl = []
    for st in range(steps_i):
        lvl = int(acc_list[st])
        if mode == "v2":
            nbl += [int(x) for x in eh2d[st][:lvl]]
            if lvl < gamma and int((eh2d[st] >= 0).sum()) > lvl:
                nbl.append(int(r_slots))
        else:
            nbl += [int(num_beams)] * lvl
            if lvl < gamma:
                nbl.append(int(num_beams))
    d = {
        "total_time": wall,
        "accepted_count": int(accepted),
        "acc_rate": float(rate_sum) / max(int(rate_cnt), 1),
        "target_call_times": steps_i,
        "approx_call_times": steps_i,
        "acc_len": acc_list,
        "expect_cnt_list": eh[eh >= 0].tolist() if mode == "v2" else [],
        "num_beams_list": nbl,
        # the dynamic-width DP runs fused inside the device program (no
        # separate host phase to time — reference :261 measures a python
        # loop); its cost is inside the calibrated phase split below.
        "compute_expect_time": 0.0,
        "tokens_generated": max(len(out) - p_len, 0),
        "tokens_per_s": max(len(out) - p_len, 0) / wall if wall > 0 else float("nan"),
    }
    fill_phase_split(
        d, wall, steps_i, bundle_d, params_d, bundle_t, params_t,
        draft_rows=num_beams, verify_rows=r_slots, gamma=gamma,
        verify_tokens=gamma * num_beams + 1, max_total=max_total,
    )
    return out, d


def beam_speculative_generate(
    bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma: int = 4, width: int = 8, num_beams: int = 8, min_num_beams: int = 1,
    eos_token_id: int, temperature: float = 1.0, top_k: int = 0,
    top_p: float = 0.0, key=None, random_seed=None, details: bool = False,
    tp_mesh=None,
):
    """beam_speculative_sampling equivalent (flattened-verification beam
    spec decode; verification computed via tree attention).

    ``width`` is accepted for reference-signature parity
    (speculative_sampling.py:587): there it only sets the draft's
    ``num_return_sequences`` while the verify walk iterates ``num_beams``
    (:756), and every reachable config sets ``num_beams = width``
    (evaluation.py:871). The tree branch factor here is ``num_beams``;
    pass ``num_beams=width`` to match the reference sweep."""
    return _run_tree(
        "v1", bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens,
        gamma=gamma, width=width, num_beams=num_beams, min_num_beams=min_num_beams,
        extra_sample_cnt=-1, expect_thres=0.7, eos_token_id=eos_token_id,
        temperature=temperature, top_k=top_k, top_p=top_p, key=key,
        details=details, tp_mesh=tp_mesh,
    )


def beam_speculative_v2_generate(
    bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens, *,
    gamma: int = 4, width: int = 8, num_beams: int = 8, min_num_beams: int = 1,
    extra_sample_cnt: int = -1, expect_thres: float = 0.7,
    eos_token_id: int, temperature: float = 1.0, top_k: int = 0,
    top_p: float = 0.0, key=None, random_seed=None, details: bool = False,
    tp_mesh=None,
):
    """beam_speculative_sampling_v2 equivalent (dynamic-width tree-attention
    speculative beam decoding — the reference flagship).

    ``width`` semantics match the reference (speculative_sampling.py:20):
    it only sets the draft's ``num_return_sequences`` (:94) while the
    accept walk iterates ``num_beams`` (:277); the headline sweep always
    runs ``num_beams = width`` (evaluation.py:871), which is how the
    harness threads it."""
    if extra_sample_cnt == -1:
        extra_sample_cnt = num_beams
    return _run_tree(
        "v2", bundle_d, params_d, bundle_t, params_t, prompt, max_new_tokens,
        gamma=gamma, width=width, num_beams=num_beams, min_num_beams=min_num_beams,
        extra_sample_cnt=extra_sample_cnt, expect_thres=expect_thres,
        eos_token_id=eos_token_id, temperature=temperature, top_k=top_k,
        top_p=top_p, key=key, details=details, tp_mesh=tp_mesh,
    )
