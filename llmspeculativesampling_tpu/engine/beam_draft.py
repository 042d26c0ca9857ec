"""Beam-sample drafting with cache reuse + intermediate capture (L2/L3).

Capability parity: the reference's ``KVCacheModel.beam_sample``
(/root/reference/sampling/kvcache_model.py:571-1025), default path
(``optimization=False``): at each of gamma steps the next beams are drawn
*without replacement* from the joint beam x vocab distribution
``softmax(warp(log_softmax(logits) + beam_scores))`` (:784-838), beam
scores become the chosen joint log-scores clamped at -1e10 (:875-876), the
KV cache is reordered by parent index (:902-905), and per-step
intermediates are captured for the verification algorithms (:885-895):
parent beam index, next token, chosen joint sampling prob, the full joint
distribution, per-beam normalized distributions, and root (input) index.

Deviations (documented): the reference's ``seq_scores`` rows are NOT
reordered by parent (kvcache_model.py:919-922) and its finalize-time
top-width selection re-sorts sequences but not the score buffers — row
misalignment bugs we fix by tracking every per-path buffer through the
parent gather, so row w of every output refers to the same path.

TPU design: the whole gamma-step loop is a ``lax.scan`` whose carry holds
the cache, beam scores, and per-path buffers; "reorder cache" is a static
batch-axis ``take``. The reference's per-step cache *snapshots*
(``beam_past_key_values``, :776) are unnecessary: consumers re-derive
committed k/v with a fixed re-derivation window (see engine notes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import KVCache, rollback, select_rows
from ..ops.sampling import (
    SamplingConfig,
    TopKDist,
    joint_rowwarp_dense,
    joint_rowwarp_topk,
    prob_of_topk,
    sample_k,
    sample_k_topk,
    use_sparse,
)

_SCORE_CLAMP = -1e10


class BeamDraftResult(NamedTuple):
    tail: jax.Array          # [B, gamma] drafted tokens per final beam path
    beam_scores: jax.Array   # [B] final joint log-scores (clamped)
    seq_q: jax.Array         # [B, gamma] chosen joint sampling prob along each path
    root: jax.Array          # [B] step-0 ancestor row of each final beam
    step_beam_idx: jax.Array  # [gamma, B] parent row at each step (pre-reorder indexing)
    step_next_tok: jax.Array  # [gamma, B]
    step_chosen_q: jax.Array  # [gamma, B] chosen joint prob (step arrangement)
    step_joint_q: jax.Array   # per-step joint distribution: dense [gamma, B*V]
                              # or, with top-k warping, a flat-id TopKDist
                              # with leading gamma axis (sparse fast path)
    perbeam_probs: jax.Array  # [B, gamma, V] per-beam normalized dist along each path
    step_root: jax.Array      # [gamma, B] root of each node (step arrangement)
    cache: KVCache
    key: jax.Array
    # capture_kv=True extras (else None): the TPU-native replacement for the
    # reference's per-step full-cache snapshots (kvcache_model.py:776) —
    # only the per-step *written* k/v slices are kept, so an accepted beam
    # path's cache can be rebuilt by an ancestor gather.
    anchor_kv: Optional[tuple] = None  # (k, v): [L, B, H, 2, D] at cur_len-2..cur_len-1
    node_kv: Optional[tuple] = None    # (k, v): [gamma-1, L, B, H, D]; entry s = node (s, b)


def beam_draft(
    bundle,
    params,
    scfg: SamplingConfig,
    gamma: int,
    num_beams: int,
    row_tokens: jax.Array,  # [num_beams, T] committed buffer per row
    cur_len: jax.Array,
    cache: KVCache,
    key: jax.Array,
    init_beam_scores: Optional[jax.Array] = None,
    init_root: Optional[jax.Array] = None,
    capture_kv: bool = False,
) -> BeamDraftResult:
    """gamma-step beam-sample draft over ``num_beams`` rows.

    Rows may hold *different* committed prefixes (the dynamic-width
    engine's parallel candidates); ``init_beam_scores`` marks padding rows
    with -inf (reference ``padding_input_cnt``, kvcache_model.py:649-650).
    The joint distribution is warped with top-k/top-p but NOT temperature,
    matching beam_sample_with_kv_cache's warper list (kvcache_model.py:494-499).
    """
    cfg = bundle.cfg
    b = num_beams
    vocab = cfg.vocab_size
    joint_cfg = SamplingConfig(1.0, scfg.top_k, scfg.top_p)

    beam_scores = (
        init_beam_scores
        if init_beam_scores is not None
        else jnp.zeros((b,), jnp.float32)
    )

    # first forward: 2-token re-derivation window (idempotent k/v rewrite)
    cache = rollback(cache, cur_len - 2)
    first_in = jax.lax.dynamic_slice(row_tokens, (0, cur_len - 2), (b, 2))
    logits, cache = bundle.forward(params, cfg, first_in, cache)
    logits0 = logits[:, -1]

    def kv_slice(c, start, size):
        zero = jnp.zeros((), jnp.int32)
        dims = (c.k.shape[0], c.k.shape[1], c.k.shape[2], size, c.k.shape[4])
        kk = jax.lax.dynamic_slice(c.k, (zero, zero, zero, jnp.asarray(start, jnp.int32), zero), dims)
        vv = jax.lax.dynamic_slice(c.v, (zero, zero, zero, jnp.asarray(start, jnp.int32), zero), dims)
        return kk, vv

    anchor_kv = kv_slice(cache, cur_len - 2, 2) if capture_kv else None

    def one_step(carry, logits_b):
        cache, beam_scores, tail, seq_q, probs_buf, root, key, step = carry
        logp = jax.nn.log_softmax(logits_b.astype(jnp.float32), axis=-1)  # [B, V]
        joint = logp + beam_scores[:, None]
        key, ks = jax.random.split(key)
        # The reference warps PER BEAM ROW before the flat softmax
        # (kvcache_model.py:795 runs the warpers on [B, V], the
        # view(1, B*V) only happens at :816-817), so the joint's support
        # is the union of per-beam nuclei — not a global top-k.
        if use_sparse(joint_cfg):
            # candidate space: B*k entries, never a [B*V] sort
            q_dist = joint_rowwarp_topk(logp, beam_scores, joint_cfg)
            t = sample_k_topk(ks, q_dist, b)  # [B] without replacement
            chosen_q = prob_of_topk(q_dist, t)
        else:
            q_joint = joint_rowwarp_dense(logp, beam_scores, joint_cfg)  # [B*V]
            q_dist = q_joint
            t = sample_k(ks, q_joint[None], b)[0]  # [B] without replacement
            chosen_q = q_joint[t]
        parent = t // vocab
        next_tok = t % vocab
        chosen_joint_score = jnp.maximum(joint[parent, next_tok], _SCORE_CLAMP)

        cache = select_rows(cache, parent)
        tail = tail[parent].at[:, step].set(next_tok)
        seq_q = seq_q[parent].at[:, step].set(chosen_q)
        perbeam = jax.nn.softmax(logp, axis=-1)  # reference 'scores' (:911-914)
        probs_buf = probs_buf[parent].at[:, step].set(perbeam[parent])
        root = root[parent]
        new_carry = (cache, chosen_joint_score, tail, seq_q, probs_buf, root, key, step + 1)
        ys = (parent, next_tok, chosen_q, q_dist, root)
        return new_carry, ys

    tail = jnp.zeros((b, gamma), jnp.int32)
    seq_q = jnp.zeros((b, gamma), jnp.float32)
    probs_buf = jnp.zeros((b, gamma, vocab), jnp.float32)
    root = init_root if init_root is not None else jnp.arange(b, dtype=jnp.int32)

    carry = (cache, beam_scores, tail, seq_q, probs_buf, root, key, jnp.zeros((), jnp.int32))
    carry, ys0 = one_step(carry, logits0)

    # remaining gamma-1 steps: 1-token forwards
    def body(carry, _):
        cache, beam_scores, tail, seq_q, probs_buf, root, key, step = carry
        last = jax.lax.dynamic_slice(tail, (jnp.zeros((), jnp.int32), step - 1), (b, 1))
        logits, cache = bundle.forward(params, cfg, last, cache)
        if capture_kv:
            # this forward wrote node (step-1, b)'s k/v at cur_len-1+step
            nk, nv = kv_slice(cache, cur_len - 1 + step, 1)
            nkv = (nk[:, :, :, 0], nv[:, :, :, 0])  # [L, B, H, D]
        carry = (cache, beam_scores, tail, seq_q, probs_buf, root, key, step)
        new_carry, ys = one_step(carry, logits[:, 0])
        return new_carry, (ys, nkv) if capture_kv else ys

    node_kv = None
    if gamma > 1:
        carry, ys_out = jax.lax.scan(body, carry, None, length=gamma - 1)
        if capture_kv:
            ys_rest, node_kv = ys_out
        else:
            ys_rest = ys_out
        ys = jax.tree.map(lambda a, r: jnp.concatenate([a[None], r], axis=0), ys0, ys_rest)
    else:
        ys = jax.tree.map(lambda a: a[None], ys0)

    cache, beam_scores, tail, seq_q, probs_buf, root, key, _ = carry
    step_beam_idx, step_next_tok, step_chosen_q, step_joint_q, step_root = ys
    return BeamDraftResult(
        tail=tail, beam_scores=beam_scores, seq_q=seq_q, root=root,
        step_beam_idx=step_beam_idx, step_next_tok=step_next_tok,
        step_chosen_q=step_chosen_q, step_joint_q=step_joint_q,
        perbeam_probs=probs_buf, step_root=step_root, cache=cache, key=key,
        anchor_kv=anchor_kv, node_kv=node_kv,
    )


def top_width(result: BeamDraftResult, width: int):
    """Reference finalize: keep the ``width`` best final beams by joint
    score (BeamSearchScorer.finalize ranking), with ALL per-path buffers
    re-selected consistently (fixing the reference's row misalignment)."""
    scores, idx = jax.lax.top_k(result.beam_scores, width)
    return (
        result.tail[idx],          # [width, gamma]
        scores,                    # [width]
        result.seq_q[idx],         # [width, gamma]
        result.perbeam_probs[idx],  # [width, gamma, V]
        idx,                       # original row ids (for cache row select)
    )
