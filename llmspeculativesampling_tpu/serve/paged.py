"""Paged continuous-batching engine: speculative decode over the shared
block-pool KV cache (cache/paged.py) — the north-star "quantized paged
KV-cache" serving path.

Relation to serve/scheduler.py (the slotted engine): the slot engine vmaps
the single-request spec step over lanes, which requires every lane to own
its cache rows — impossible with one shared pool (functional vmap lanes
cannot write disjoint pieces of shared state). The paged engine therefore
runs the draft/verify phases **batch-level** (one batched model forward
with per-row block tables and lengths, models/llama.py paged path) and
vmaps only the cache-free accept/resample math, reusing
``engine.speculative.accept_phase`` verbatim.

What paging buys over slots (measured in scripts/bench_paged.py):
  * on-demand allocation (``on_demand=True``, the default): HBM holds
    Σ(actual request lengths + a two-chunk runway) of KV — admission
    reserves only the prompt's pages plus the runway, ``_ensure_runway``
    appends pages as lengths grow, and on pool exhaustion the youngest
    row is PREEMPTED (pages freed, request requeued with its committed
    tokens + evolved PRNG key; the resumed run replays bit-identically).
    ``on_demand=False`` keeps the legacy per-request worst-case
    reservation (Σ(p_len + max_new + γ + 1)) for comparison;
  * mixed-length workloads admit more concurrent requests at the same
    memory than num_slots × max_total_len slotting;
  * admission control is *byte-accurate*: a request is admitted exactly
    when its pages fit, instead of when a worst-case-sized slot frees.

Algorithm parity: each row runs the reference ``speculative_sampling``
loop (speculative_sampling.py:1877-2076) — draft gamma, one verify
forward, ratio-test accept, residual resample — with identical math to
``engine.speculative``.
"""

from __future__ import annotations

import collections
import dataclasses
import time
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..cache.paged import (
    PageAllocator,
    SharedPageAllocator,
    init_paged_cache,
    prompt_page_hashes,
    rollback_rows,
)
from ..engine.speculative import accept_phase
from ..engine.types import ModelBundle, first_eos_truncate, pad_prompt
from ..ops.sampling import SamplingConfig, dist_norm
from .scheduler import Completion, Request


class PagedBatchState(NamedTuple):
    tokens: jax.Array        # [B, T_max]
    cur_len: jax.Array       # [B]
    draft_cache: object      # PagedKVCache/QuantPagedKVCache, batch B
    target_cache: object
    key: jax.Array           # [B] PRNG keys
    active: jax.Array        # [B] bool
    done: jax.Array          # [B] bool
    target_len: jax.Array    # [B]
    # rows with cur_len < prefill_to are PIGGYBACK-PREFILLING (SARATHI,
    # chunked_prefill=True): each step their "verify window" carries the
    # next gamma+1 PROMPT tokens through the batched target forward —
    # the cold prompt's target KV is computed inside the verify pass the
    # decode rows pay for anyway (zero extra weight reads) — advancing
    # cur_len by gamma/step with no sampling effects and the PRNG key
    # held frozen (so the eventual decode stream is bit-identical to the
    # monolithic-prefill engine's). prefill_to == p_len for normally
    # admitted rows, making the predicate False.
    prefill_to: jax.Array    # [B]
    accepted: jax.Array      # [B]
    resamples: jax.Array
    bonus: jax.Array
    steps: jax.Array
    acc_rate_sum: jax.Array  # [B] f32
    acc_len_hist: jax.Array  # [B, max_new_cap]


def _rows_window(tokens: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """Per-row gather tokens[b, starts[b] : starts[b]+width] -> [B, width]."""
    idx = starts[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(tokens, idx, axis=1)


def _draft_phase_batched(bundle, params, scfg, gamma, tokens, cur_len, cache, keys):
    """Batched analogue of engine.speculative.draft_phase: per-row window
    re-feed (the paged 'rollback' is the per-row length reset) + gamma-1
    scanned single-token steps. Returns (tokens', cache', q_stack rows
    [B, gamma, ...], drafts [B, gamma], keys')."""
    cfg = bundle.cfg
    b = tokens.shape[0]
    cache = rollback_rows(cache, cur_len - 2)
    first_in = _rows_window(tokens, cur_len - 2, 2)
    logits, cache = bundle.forward(params, cfg, first_in, cache)
    q0 = dist_norm(logits[:, -1], scfg)  # [B, ...] dist

    splits = jax.vmap(jax.random.split)(keys)  # [B, 2]
    keys, k0 = splits[:, 0], splits[:, 1]
    x0 = jax.vmap(lambda k, d: _d_sample(k, d))(k0, q0)  # [B]
    tokens = tokens.at[jnp.arange(b), cur_len].set(x0)

    def body(carry, _):
        cache, last, keys = carry
        logits, cache = bundle.forward(params, cfg, last[:, None], cache)
        q = dist_norm(logits[:, 0], scfg)
        sp = jax.vmap(jax.random.split)(keys)
        keys, ks = sp[:, 0], sp[:, 1]
        x = jax.vmap(lambda k, d: _d_sample(k, d))(ks, q)
        return (cache, x, keys), (q, x)

    if gamma > 1:
        (cache, _, keys), (q_rest, x_rest) = jax.lax.scan(
            body, (cache, x0, keys), None, length=gamma - 1
        )
        # scan stacks on axis 0: [gamma-1, B, ...] -> row-major [B, gamma, ...]
        q_stack = jax.tree.map(
            lambda a, rest: jnp.concatenate([a[:, None], jnp.moveaxis(rest, 0, 1)], axis=1),
            q0, q_rest,
        )
        drafts = jnp.concatenate([x0[:, None], x_rest.T], axis=1)  # [B, gamma]
        cols = cur_len[:, None] + 1 + jnp.arange(gamma - 1, dtype=jnp.int32)[None, :]
        tokens = tokens.at[jnp.arange(b)[:, None], cols].set(x_rest.T)
    else:
        q_stack = jax.tree.map(lambda a: a[:, None], q0)
        drafts = x0[:, None]
    return tokens, cache, q_stack, drafts, keys


def _d_sample(key, dist):
    from ..ops.sampling import dist_sample

    # per-row draw under vmap: dist leaves lose their batch axis here
    return dist_sample(key, jax.tree.map(lambda x: x[None], dist))[0]


def _verify_phase_batched(bundle, params, scfg, gamma, tokens, cur_len, cache,
                          extra: int = 0):
    """One batched verify forward over per-row windows of gamma+1+extra
    tokens. ``extra`` > 0 (prefill_extra) widens the window so
    piggyback-prefilling rows push gamma+extra PROMPT tokens of KV per
    step; decode rows' trailing ``extra`` positions carry junk tokens
    whose KV lands beyond their accepted region (rewritten before the
    length pointer ever crosses them — the standard invariant) and whose
    distributions are sliced off before the accept math."""
    cfg = bundle.cfg
    cache = rollback_rows(cache, cur_len - 1)
    vin = _rows_window(tokens, cur_len - 1, gamma + 1 + extra)
    logits, cache = bundle.forward(params, cfg, vin, cache)
    return dist_norm(logits, scfg), cache  # [B, gamma+1+extra, ...]


def _paged_spec_step(
    bundle_d, bundle_t, params_d, params_t, scfg, gamma, eos_token_id,
    state: PagedBatchState, prefill_extra: int = 0,
):
    tokens, cur_len = state.tokens, state.cur_len
    b = tokens.shape[0]

    # DEAD rows (inactive or done) must not touch the pools: the batched
    # draft/verify phases run every row, and a harvested row's table
    # still points at FREED blocks — its stale writes clobber whichever
    # newly admitted row now owns those pages (observed as a scheduling-
    # cadence-dependent token flip: a tail-idle row kept rewriting
    # positions inside a live request's reused pages). Gate dead rows'
    # tables to the out-of-range sentinel: scatters drop, gathers clip
    # to garbage that the per-row length mask already hides, and the
    # row's outputs are discarded by ``keep`` anyway. Re-admission
    # reinstalls real tables (_admit_tables / _flush_maintenance).
    live = state.active & jnp.logical_not(state.done)
    # piggyback-prefilling rows (see prefill_to in PagedBatchState): the
    # DRAFT phase must neither sample drafts into their prompt tokens
    # nor scribble its sampled-token k/v over their (already prefilled)
    # draft KV — gate their draft tables too. The TARGET verify pass IS
    # their prefill and stays ungated.
    prefilling = cur_len < state.prefill_to

    def _gate(cache, ok):
        pool = cache.k_q if hasattr(cache, "k_q") else cache.k
        sent = jnp.int32(pool.shape[1])
        return dataclasses.replace(
            cache,
            block_tables=jnp.where(ok[:, None], cache.block_tables, sent),
        )

    tokens2, draft_cache, q_stack, drafts, keys = _draft_phase_batched(
        bundle_d, params_d, scfg, gamma, tokens, cur_len,
        _gate(state.draft_cache, live & jnp.logical_not(prefilling)),
        state.key
    )
    # restore prefilling rows' prompt tokens (the draft phase wrote its
    # sampled drafts at cur_len..cur_len+gamma-1): their verify window
    # must carry the PROMPT
    tokens2 = jnp.where(prefilling[:, None], tokens, tokens2)
    p_stack, target_cache = _verify_phase_batched(
        bundle_t, params_t, scfg, gamma, tokens2, cur_len,
        _gate(state.target_cache, live), extra=prefill_extra
    )
    if prefill_extra:
        p_stack = jax.tree.map(lambda x: x[:, : gamma + 1], p_stack)
    # the gates above are PER-STEP views — the sentinels must not
    # persist into the carried state (a prefilling row's draft table
    # would otherwise stay sentineled after its prefill completes and
    # its decode would draft against garbage)
    draft_cache = dataclasses.replace(
        draft_cache, block_tables=state.draft_cache.block_tables)
    target_cache = dataclasses.replace(
        target_cache, block_tables=state.target_cache.block_tables)

    # accept/resample math is cache-free -> reuse the single-request
    # accept_phase (engine/speculative.py) vmapped over rows
    def accept_row(tok_row, cl, q_row, d_row, p_row, key):
        return accept_phase(
            scfg, gamma, eos_token_id, tok_row[None], cl, q_row, d_row, p_row,
            key, None,
        )

    tok3, new_len, _t, n, all_acc, acc_step, keys2 = jax.vmap(accept_row)(
        tokens2, cur_len, q_stack, drafts, p_stack, keys
    )
    tokens3 = tok3[:, 0]

    # prefilling rows: the verify wrote target KV for positions
    # cur_len-1 .. cur_len+gamma-1, so advance gamma along the prompt;
    # tokens stay the prompt, the PRNG key stays FROZEN (the decode
    # stream after prefill completes must match the monolithic engine's
    # bit-for-bit), and no sampling statistics accrue.
    new_len = jnp.where(
        prefilling,
        jnp.minimum(cur_len + gamma + prefill_extra, state.prefill_to),
        new_len)
    tokens3 = jnp.where(prefilling[:, None], tokens, tokens3)
    keys2 = jax.random.wrap_key_data(jnp.where(
        prefilling[:, None],
        jax.random.key_data(state.key), jax.random.key_data(keys2)))

    pos = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
    new_mask = (pos >= cur_len[:, None]) & (pos < new_len[:, None])
    done_now = jnp.any(new_mask & (tokens3 == eos_token_id), axis=1)
    done_now = jnp.logical_and(done_now, jnp.logical_not(prefilling))

    keep = live
    keep_stats = keep & jnp.logical_not(prefilling)

    def sel(new, old, k=None):
        return jnp.where(keep if k is None else k, new, old)

    col = jnp.minimum(state.steps, state.acc_len_hist.shape[1] - 1)
    hist = jnp.where(
        keep_stats[:, None],
        state.acc_len_hist.at[jnp.arange(b), col].set(n),
        state.acc_len_hist,
    )
    return PagedBatchState(
        tokens=jnp.where(keep[:, None], tokens3, state.tokens),
        cur_len=sel(new_len, cur_len),
        draft_cache=draft_cache,
        target_cache=target_cache,
        key=keys2,
        active=state.active,
        done=sel(jnp.logical_or(done_now, new_len >= state.target_len), state.done),
        target_len=state.target_len,
        prefill_to=state.prefill_to,
        accepted=sel(state.accepted + n, state.accepted, keep_stats),
        resamples=sel(state.resamples + jnp.where(all_acc, 0, 1),
                      state.resamples, keep_stats),
        bonus=sel(state.bonus + jnp.where(all_acc, 1, 0), state.bonus,
                  keep_stats),
        steps=sel(state.steps + 1, state.steps, keep_stats),
        acc_rate_sum=sel(state.acc_rate_sum + acc_step, state.acc_rate_sum,
                         keep_stats),
        acc_len_hist=hist,
    )


def _paged_chunk_body(
    params_d, params_t, state: PagedBatchState, *,
    bundle_d, bundle_t, gamma: int, scfg: SamplingConfig, eos_token_id: int,
    n_steps: int, prefill_extra: int = 0,
):
    """Up to n_steps decode steps with device-side early exit: once every
    active row is done, remaining steps are skipped ON DEVICE (a
    fori_loop would burn full model forwards on finished batches —
    measured: steps_per_sync=8 LOWERED 13B throughput 410 -> 324 tok/s
    purely from overshoot). Shape-polymorphic over the rows/pool axes so
    the same body serves the global jit AND the per-dp-shard view inside
    shard_map (each shard sees B/dp rows over its N/dp-block local
    pool)."""
    def cond(carry):
        i, s = carry
        live = jnp.any(s.active & jnp.logical_not(s.done))
        return jnp.logical_and(i < n_steps, live)

    def one(carry):
        i, s = carry
        return i + 1, _paged_spec_step(
            bundle_d, bundle_t, params_d, params_t, scfg, gamma, eos_token_id,
            s, prefill_extra,
        )

    a0 = jnp.sum(state.accepted)
    s0 = jnp.sum(state.steps)
    _, state = jax.lax.while_loop(cond, one, (jnp.zeros((), jnp.int32), state))
    # chunk-level accept/step deltas feed the adaptive-gamma controller
    # (admission/harvest never happen inside a chunk, so the deltas are
    # exactly this chunk's work); shaped [1] so the dp shard_map can
    # stack them over shards
    acc_delta = (jnp.sum(state.accepted) - a0)[None]
    step_delta = (jnp.sum(state.steps) - s0)[None]
    return state, _pack_chunk_meta(state, acc_delta, step_delta)


def _pack_chunk_meta(state: PagedBatchState, acc_delta, step_delta) -> jax.Array:
    """Pack EVERYTHING the host scheduler reads after a chunk — the
    cur_len/done scheduling metadata AND the full harvest payload
    (tokens, per-row counters, accept histories) — into one flat int32
    vector. Two reasons this is a single concatenated buffer:
      * concatenate materializes a fresh buffer, so the output can never
        alias the donated state (the pipelined ``copy_to_host_async``
        survives donation — see _paged_chunk's docstring);
      * harvest used to ``host_fetch(self.state...)``, which blocks on
        the IN-FLIGHT chunk's pending output under the one-deep
        pipeline. With synchronized completion waves the in-flight
        chunk early-exits and the fetch was cheap, but any staggered
        completion (mixed workloads, or an unlucky per-request PRNG
        making one row run a chunk longer) stalled ~a full chunk wall
        PER HARVEST — measured 850 ms stalls and a 623 -> 500 tok/s
        whole-run regression on the saturated 13B bench. Shipping the
        harvest payload inside the chunk's own (already async-copied)
        metadata makes harvest zero-fetch and the stall class
        impossible.
    Layout per shard-local block of b rows (all int32; f32/u32 bitcast):
      [cur_len b | done b | steps b | accepted b | resamples b |
       bonus b | acc_rate_sum(bitcast) b | acc_delta 1 | step_delta 1 |
       key_data(bitcast) b*2 | acc_len_hist b*h | tokens b*t]

    ``key_data`` is each row's EVOLVED PRNG key: preemption (on-demand
    paging) resumes a request from its last harvested snapshot, and
    restoring this key makes the continuation replay bit-identically."""
    f = lambda x: x.astype(jnp.int32).reshape(-1)
    return jnp.concatenate([
        f(state.cur_len), f(state.done), f(state.steps), f(state.accepted),
        f(state.resamples), f(state.bonus),
        jax.lax.bitcast_convert_type(
            state.acc_rate_sum.astype(jnp.float32), jnp.int32).reshape(-1),
        f(acc_delta), f(step_delta),
        jax.lax.bitcast_convert_type(
            jax.random.key_data(state.key), jnp.int32).reshape(-1),
        f(state.acc_len_hist), f(state.tokens),
    ])


def _unpack_chunk_meta(pack: np.ndarray, b: int, h: int, t: int) -> dict:
    """Host-side inverse of :func:`_pack_chunk_meta` for one shard-local
    block (or the whole batch when dp == 1)."""
    o = 0

    def take(n, shape=None):
        nonlocal o
        out = pack[o : o + n]
        o += n
        return out.reshape(shape) if shape else out

    return {
        "cur_len": take(b), "done": take(b).astype(bool),
        "steps": take(b), "accepted": take(b), "resamples": take(b),
        "bonus": take(b),
        "acc_rate_sum": take(b).view(np.float32),
        "acc_delta": int(take(1)[0]), "step_delta": int(take(1)[0]),
        "key_data": take(b * 2, (b, 2)).view(np.uint32),
        "acc_len_hist": take(b * h, (b, h)), "tokens": take(b * t, (b, t)),
    }


@partial(
    jax.jit,
    static_argnames=("bundle_d", "bundle_t", "gamma", "scfg", "eos_token_id",
                     "n_steps", "prefill_extra"),
    donate_argnames=("state",),
)
def _paged_chunk(
    params_d, params_t, state: PagedBatchState, *,
    bundle_d, bundle_t, gamma: int, scfg: SamplingConfig, eos_token_id: int,
    n_steps: int, prefill_extra: int = 0,
):
    return _paged_chunk_body(
        params_d, params_t, state, bundle_d=bundle_d, bundle_t=bundle_t,
        gamma=gamma, scfg=scfg, eos_token_id=eos_token_id, n_steps=n_steps,
        prefill_extra=prefill_extra,
    )


def _install_state(
    state: PagedBatchState, rows, tables, prompts, p_lens, max_news, keys,
    d_cache, t_cache, cur0=None,
) -> PagedBatchState:
    """Install K admitted rows' scheduler metadata (tokens, lengths, PRNG
    keys, activity flags) around already-updated caches. Padding rows
    carry row index == B (scatters drop). ``cur0`` (default = p_lens)
    is the starting cur_len — piggyback-prefilling admissions pass
    cached_len + 1 so the rows enter the step loop mid-prompt with
    ``prefill_to = p_lens`` marking the boundary."""
    kb = rows.shape[0]
    if cur0 is None:
        cur0 = p_lens
    d_cache = dataclasses.replace(
        d_cache, lengths=d_cache.lengths.at[rows].set(cur0, mode="drop")
    )
    t_cache = dataclasses.replace(
        t_cache, lengths=t_cache.lengths.at[rows].set(cur0, mode="drop")
    )

    t_max = state.tokens.shape[1]
    tok_rows = jnp.zeros((kb, t_max), jnp.int32)
    tok_rows = jax.lax.dynamic_update_slice(tok_rows, prompts, (0, 0))
    zeros_k = jnp.zeros((kb,), jnp.int32)

    def scat(big, small):
        return big.at[rows].set(small.astype(big.dtype), mode="drop")

    return PagedBatchState(
        tokens=scat(state.tokens, tok_rows),
        cur_len=scat(state.cur_len, cur0),
        draft_cache=d_cache,
        target_cache=t_cache,
        key=state.key.at[rows].set(keys, mode="drop"),
        active=scat(state.active, jnp.ones((kb,), bool)),
        done=scat(state.done, jnp.zeros((kb,), bool)),
        target_len=scat(state.target_len, p_lens + max_news),
        prefill_to=scat(state.prefill_to, p_lens),
        accepted=scat(state.accepted, zeros_k),
        resamples=scat(state.resamples, zeros_k),
        bonus=scat(state.bonus, zeros_k),
        steps=scat(state.steps, zeros_k),
        acc_rate_sum=scat(state.acc_rate_sum, jnp.zeros((kb,), jnp.float32)),
        acc_len_hist=scat(
            state.acc_len_hist,
            jnp.zeros((kb, state.acc_len_hist.shape[1]), jnp.int32),
        ),
    )


def _admit_tables(state, rows, tables):
    def admit_cache(cache):
        bt = cache.block_tables.at[rows].set(tables, mode="drop")
        ln = cache.lengths.at[rows].set(0, mode="drop")
        return dataclasses.replace(cache, block_tables=bt, lengths=ln)

    return admit_cache(state.draft_cache), admit_cache(state.target_cache)


def _transplant(cache, after):
    return dataclasses.replace(
        cache, **{k: getattr(after, k) for k in _pool_fields(after)}
    )


def _paged_prefill_body(
    params_d, params_t, state: PagedBatchState, rows, tables, prompts, p_lens,
    max_news, keys, *, bundle_d: ModelBundle, bundle_t: ModelBundle,
):
    """Admit K requests in one dispatch: install their block tables, then
    one batched prefill forward per model writing straight into the shared
    pools (weights are read once per burst — same batched-admission
    economics as serve/scheduler.py _prefill_batch). Padding rows carry
    row index == B (scatters drop) and sentinel tables (pool writes
    drop)."""
    kb = rows.shape[0]
    d_cache, t_cache = _admit_tables(state, rows, tables)

    # K-row view over the SAME pools: the prefill's pool writes are the
    # real admission writes (block tables are disjoint by construction)
    def k_view(cache):
        return dataclasses.replace(
            cache,
            block_tables=tables.astype(jnp.int32),
            lengths=jnp.zeros((kb,), jnp.int32),
        )

    # paged_prefill: rows are empty -> block-only attention + one deferred
    # all-layers pool write (no pool reads; no in-scan pool mutation)
    _, d_after = bundle_d.forward(
        params_d, bundle_d.cfg, prompts, k_view(d_cache), paged_prefill=True
    )
    _, t_after = bundle_t.forward(
        params_t, bundle_t.cfg, prompts, k_view(t_cache), paged_prefill=True
    )
    return _install_state(
        state, rows, tables, prompts, p_lens, max_news, keys,
        _transplant(d_cache, d_after), _transplant(t_cache, t_after),
    )


_paged_prefill = partial(
    jax.jit, static_argnames=("bundle_d", "bundle_t"), donate_argnames=("state",)
)(_paged_prefill_body)


def _paged_draft_extend_body(
    params_d, state: PagedBatchState, tables, lens_now, window,
    *, bundle_d: ModelBundle,
):
    """Draft-ONLY extend window: piggyback-prefilled admissions compute
    their target KV for free inside later verify passes, but the draft
    model (cheap — a 68m-scale draft reads ~140 MB of weights per
    window vs the target's 13.2 GB) is prefilled up front with these
    tiny dispatches so the first decode step has its full prefix."""
    kb = tables.shape[0]

    def k_view(cache):
        return dataclasses.replace(
            cache,
            block_tables=tables.astype(jnp.int32),
            lengths=jnp.asarray(lens_now, jnp.int32),
        )

    _, d_after = bundle_d.forward(
        params_d, bundle_d.cfg, window, k_view(state.draft_cache))
    return state._replace(
        draft_cache=_transplant(state.draft_cache, d_after))


_paged_draft_extend = partial(
    jax.jit, static_argnames=("bundle_d",), donate_argnames=("state",)
)(_paged_draft_extend_body)


def _paged_extend_body(
    params_d, params_t, state: PagedBatchState, tables, lens_now, window,
    *, bundle_d: ModelBundle, bundle_t: ModelBundle,
):
    """One chunked-prefill step for prefix-cache-hit admissions: run both
    models over ``window`` [KB, W] with the rows' caches at ``lens_now``
    (the shared-prefix boundary, then advancing W per chunk). Uses the
    normal paged decode path — the flash kernel DMAs the cached prefix
    pages, and the new KV lands via the deferred post-scan write. Padding
    rows carry sentinel tables (writes dropped)."""
    kb = tables.shape[0]

    def k_view(cache):
        return dataclasses.replace(
            cache,
            block_tables=tables.astype(jnp.int32),
            lengths=jnp.asarray(lens_now, jnp.int32),
        )

    _, d_after = bundle_d.forward(params_d, bundle_d.cfg, window, k_view(state.draft_cache))
    _, t_after = bundle_t.forward(params_t, bundle_t.cfg, window, k_view(state.target_cache))
    return state._replace(
        draft_cache=_transplant(state.draft_cache, d_after),
        target_cache=_transplant(state.target_cache, t_after),
    )


_paged_extend_chunk = partial(
    jax.jit, static_argnames=("bundle_d", "bundle_t"), donate_argnames=("state",)
)(_paged_extend_body)


def _paged_finalize_body(
    state: PagedBatchState, rows, tables, prompts, p_lens, max_news, keys,
    cur0=None,
):
    """Install metadata for rows whose KV was already computed (prefix
    cache hit + extend chunks) or will be piggyback-prefilled
    (``cur0`` < p_lens): like _paged_prefill without the model
    forwards."""
    d_cache, t_cache = _admit_tables(state, rows, tables)
    return _install_state(
        state, rows, tables, prompts, p_lens, max_news, keys, d_cache, t_cache,
        cur0=cur0,
    )


_paged_finalize = partial(jax.jit, donate_argnames=("state",))(_paged_finalize_body)


def _paged_maintain_body(state: PagedBatchState, tables, deact):
    """On-demand paging maintenance, one tiny dispatch before a chunk:
    install the host allocator's current block tables (rows grow pages as
    their length crosses page boundaries — ``tables`` is the full [B,
    max_pages] host mirror, shard-local ids under dp) and deactivate
    preempted rows (``deact`` [B] bool) so no later chunk writes into
    pages the allocator already handed to someone else. The in-FLIGHT
    chunk may still write a preempted row's old pages, but the device
    stream orders that before any reuse, and no position is ever read
    before the owning row rewrites it."""
    t = jnp.asarray(tables, jnp.int32)
    return state._replace(
        draft_cache=dataclasses.replace(state.draft_cache, block_tables=t),
        target_cache=dataclasses.replace(state.target_cache, block_tables=t),
        active=jnp.where(deact, False, state.active),
        done=jnp.where(deact, True, state.done),
    )


_paged_maintain = partial(jax.jit, donate_argnames=("state",))(_paged_maintain_body)


def _pool_fields(cache):
    return (
        ("k_q", "k_s", "v_q", "v_s")
        if hasattr(cache, "k_q")
        else ("k", "v")
    )


def _cache_dp_specs(cache):
    """shard_map PartitionSpecs (MANUAL dp axis only) for a paged cache:
    pool data/scales split on the blocks axis, tables/lengths on rows."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DP_AXIS

    def f(x):
        if x.ndim >= 4:  # pool [L, N, H, page(, D)]
            return P(None, DP_AXIS, *([None] * (x.ndim - 2)))
        if x.ndim == 2:  # block_tables [B, P]
            return P(DP_AXIS, None)
        return P(DP_AXIS)  # lengths [B]

    return jax.tree.map(f, cache)


def _state_dp_specs(state: PagedBatchState):
    """shard_map specs for the whole batch state: every rows-axis leaf
    split over dp; pools split on their blocks axis (see the dp design
    note on PagedEngine)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DP_AXIS

    def rows(x):
        return P(DP_AXIS, *([None] * (x.ndim - 1)))

    return PagedBatchState(
        tokens=rows(state.tokens), cur_len=P(DP_AXIS),
        draft_cache=_cache_dp_specs(state.draft_cache),
        target_cache=_cache_dp_specs(state.target_cache),
        key=P(DP_AXIS), active=P(DP_AXIS), done=P(DP_AXIS),
        target_len=P(DP_AXIS), prefill_to=P(DP_AXIS),
        accepted=P(DP_AXIS), resamples=P(DP_AXIS),
        bonus=P(DP_AXIS), steps=P(DP_AXIS), acc_rate_sum=P(DP_AXIS),
        acc_len_hist=rows(state.acc_len_hist),
    )


def _build_dp_fns(mesh, state, bundle_d, bundle_t, gamma, scfg, eos_token_id,
                  n_steps, prefill_extra=0):
    """jit(shard_map(...)) wrappers of the four device entry points,
    manual over dp (each shard = an independent B/dp-row engine over its
    own N/dp-block pool half, zero cross-dp collectives in steady state),
    auto over tp (params/pool-head shardings keep riding GSPMD inside)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DP_AXIS

    sspec = _state_dp_specs(state)
    rows_s, mat_s = P(DP_AXIS), P(DP_AXIS, None)
    dp_manual = {DP_AXIS}

    def make_chunk(g):
        def chunk(params_d, params_t, st):
            return _paged_chunk_body(
                params_d, params_t, st, bundle_d=bundle_d, bundle_t=bundle_t,
                gamma=g, scfg=scfg, eos_token_id=eos_token_id, n_steps=n_steps,
                prefill_extra=prefill_extra)
        return chunk

    def prefill(params_d, params_t, st, rows, tables, prompts, p_lens,
                max_news, keys):
        return _paged_prefill_body(
            params_d, params_t, st, rows, tables, prompts, p_lens, max_news,
            keys, bundle_d=bundle_d, bundle_t=bundle_t)

    def extend(params_d, params_t, st, tables, lens_now, window):
        return _paged_extend_body(
            params_d, params_t, st, tables, lens_now, window,
            bundle_d=bundle_d, bundle_t=bundle_t)

    def finalize(st, rows, tables, prompts, p_lens, max_news, keys, cur0):
        return _paged_finalize_body(
            st, rows, tables, prompts, p_lens, max_news, keys, cur0=cur0)

    def extend_draft(params_d, st, tables, lens_now, window):
        return _paged_draft_extend_body(
            params_d, st, tables, lens_now, window, bundle_d=bundle_d)

    def maintain(st, tables, deact):
        return _paged_maintain_body(st, tables, deact)

# Donate the state like every single-mesh entry point does
    # (ADVICE r3 #2): without it each dp chunk/prefill transiently holds
    # two full copies of both KV pools — pool is sized to the HBM budget,
    # so the copy doubles peak memory exactly where dp targets big models.
    sm = lambda f, ins, outs, st_idx: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=ins, out_specs=outs,
        axis_names=dp_manual, check_vma=False), donate_argnums=(st_idx,))
    adm = (rows_s, mat_s, mat_s, rows_s, rows_s, rows_s)
    # the packed per-shard meta/harvest vector concatenates over dp:
    # global layout = [shard0 pack | shard1 pack | ...]
    chunk_out = (sspec, rows_s)
    return {
        "chunk": sm(make_chunk(gamma), (P(), P(), sspec), chunk_out, 2),
        "chunk_for_gamma": lambda g: sm(
            make_chunk(g), (P(), P(), sspec), chunk_out, 2),
        "prefill": sm(prefill, (P(), P(), sspec) + adm, sspec, 2),
        "extend": sm(extend, (P(), P(), sspec, mat_s, rows_s, mat_s), sspec, 2),
        "extend_draft": sm(extend_draft, (P(), sspec, mat_s, rows_s, mat_s),
                           sspec, 1),
        "finalize": sm(finalize, (sspec,) + adm + (rows_s,), sspec, 0),
        "maintain": sm(maintain, (sspec, mat_s, rows_s), sspec, 0),
    }


class PagedEngine:
    """Continuous batching over a paged (optionally int8) KV pool.

    Host scheduler mirrors serve/scheduler.py's: submit -> queue; admit
    when a batch row AND the request's pages are both free (byte-accurate
    admission control); decode in ``steps_per_sync``-deep chunks with one
    packed metadata fetch per chunk; harvest frees the pages.

    ``prefix_cache=True`` turns on automatic prefix caching
    (cache/paged.py::SharedPageAllocator): requests whose prompt repeats
    an earlier prompt's page-aligned prefix reference the already-computed
    KV pages instead of recomputing them — admission then only runs the
    suffix through ``extend_chunk``-token chunked prefill
    (_paged_extend_chunk). Hot system prompts cost one prefill ever
    (until evicted under pool pressure).
    """

    def __init__(
        self,
        bundle_d: ModelBundle, params_d,
        bundle_t: ModelBundle, params_t,
        *,
        batch_rows: int = 8,
        num_blocks: int = 64,
        page: int = 128,
        max_pages_per_req: Optional[int] = None,
        max_new_cap: int = 256,
        gamma: int = 4,
        eos_token_id: int = 2,
        temperature: float = 1.0,
        top_k: int = 20,
        top_p: float = 0.9,
        seed: int = 0,
        prompt_bucket: int = 64,
        steps_per_sync: int = 4,
        kv_quant: bool = False,
        prefill_token_budget: int = 512,
        prefix_cache: bool = False,
        extend_chunk: int = 32,
        mesh=None,
        pool_pad_128=None,
        adaptive_gamma=None,
        adaptive_gamma_mode: str = "epoch",
        on_demand: bool = True,
        overcommit: float = 1.0,
        chunked_prefill: bool = False,
        prefill_extra: int = 0,
    ):
        self.bundle_d, self.params_d = bundle_d, params_d
        self.bundle_t, self.params_t = bundle_t, params_t
        self.batch_rows = batch_rows
        self.page = page
        # adaptive gamma (value-add beyond the reference's fixed gamma,
        # in the spirit of compression-aware gamma selection —
        # PAPERS.md SpecKV): pass a tuple of candidate depths and the
        # engine re-picks the draft depth from MEASURED throughput.
        # Measured rates automatically price in everything an analytic
        # acceptance model misses (tail truncation against target_len,
        # dispatch RTT amortization, batch effects): on the 13B uniform
        # workload the analytic E[tokens]/cost chooser picked gamma=16
        # (acc 0.90) at 355 tok/s while measured gamma=8 serves 470.
        # Page sizing uses max(choices) so any depth fits.
        #
        # Two feedback granularities (adaptive_gamma_mode):
        #  * "epoch" (default): arms switch only at EPOCH boundaries
        #    (one epoch ~= a full row-set turnover of COMPLETED
        #    requests); the arm signal is completed-request throughput
        #    (sum of finished requests' generated tokens / epoch wall).
        #    This is the granularity at which the queue-level optimum is
        #    visible: round-3 ground truth showed per-chunk committed-
        #    token rate genuinely ranks gamma=8 chunks above gamma=4,
        #    yet fixed gamma=4 wins the saturated 96-request bench 612
        #    vs 470 tok/s because shallow drafts finish requests sooner
        #    and faster row turnover feeds admissions — an effect no
        #    within-chunk measurement can see (docs/PERFORMANCE.md).
        #    The per-chunk EMA below still runs, as the exploration-
        #    order prior and the acceptance observability signal.
        #  * "chunk": round 3's per-chunk bandit (kept for comparison;
        #    converges to the 2nd-best arm on saturated queues).
        self._gamma_choices = tuple(sorted(adaptive_gamma)) if adaptive_gamma else None
        if adaptive_gamma_mode not in ("epoch", "chunk"):
            raise ValueError(f"adaptive_gamma_mode={adaptive_gamma_mode!r}")
        self._ag_mode = adaptive_gamma_mode
        self._acc_ema = None       # per-token acceptance estimate (reporting)
        self._arm_rate = {}        # gamma -> EMA tokens/s of its chunks
        self._chunk_count = 0
        # per-chunk wall attribution: dispatch pushes its gamma;
        # consuming chunk k's metadata pops it and measures wall
        # FETCH-TO-FETCH — _meta_np(k) blocks until chunk k finished, so
        # consecutive fetch gaps track each chunk's real duration even
        # under the one-deep pipeline (dispatch-to-dispatch gaps track
        # the PREVIOUS chunk and poisoned the bandit: it preferred
        # gamma=16 at 325 tok/s where ground truth ranks gamma=4 at 611)
        self._chunk_log = collections.deque()
        self._last_fetch_t = None
        if self._gamma_choices:
            # epoch mode ramps on the SHALLOWEST arm (cheapest per chunk
            # and the turnover-friendly end — deep arms' risk is
            # overshoot); chunk mode keeps its middle-arm start
            gamma = (self._gamma_choices[0] if adaptive_gamma_mode == "epoch"
                     else self._gamma_choices[len(self._gamma_choices) // 2])
        self.gamma = gamma
        # epoch-mode state. Every epoch closes after a FULL row turnover
        # of completions (batch_rows): on saturated uniform workloads
        # completions arrive in synchronized WAVES, and sub-wave epochs
        # alias against the wave boundary (measured: quarter-wave epochs
        # read gamma=8 at 136 tok/s and gamma=16 at 388 on a workload
        # whose true order is 470/335/248 — the short window lands
        # either on a burst or on the inter-wave gap). Tick granularity
        # is per-chunk-fetch, so a closure always lands AT a burst and
        # the wall spans an integer number of waves. Exploration of a
        # clearly-losing arm is bounded by the WALL CAP instead: an
        # explore/probe epoch that hasn't turned the rows over within
        # 1.6x the best arm's per-completion pace is closed early with
        # its (low) partial rate — a principled abort, since an arm that
        # cannot finish a wave at 1.6x the incumbent's pace has already
        # lost the completed-throughput comparison.
        self._ep_rate = {}            # gamma -> EMA completed tok/s
        self._ep_size = max(batch_rows, 4)
        self._ep_tokens = 0
        self._ep_completions = 0
        self._ep_start = None
        self._ep_phase = "ramp"       # ramp | explore | exploit | probe
        self._ep_count = 0
        self._ep_reprobe_every = 16
        self._ep_wall_cap = 1.6
        # exploit hysteresis: a challenger must beat the incumbent's EMA
        # by >12% to take over. Adjacent arms' epoch rates carry ±10-20%
        # noise from arm-switch wave disruption; without hysteresis a
        # 504-vs-499 read flipped a 288-request run onto the 2nd-best
        # arm and the resulting flip-flopping kept every wave staggered
        # (~380 tok/s where the stable incumbent serves ~600)
        self._ep_hysteresis = 1.12
        self._ep_incumbent = None
        # round-5 exploration-tax cut (VERDICT r4 ask #3): the ramp epoch
        # ROTATES gamma per chunk across all arms (gamma is batch-global,
        # so every row advances together and the completion wave stays
        # synchronized — rotation is free), collecting a per-chunk
        # committed-rate prior for every arm during the wave the engine
        # must serve anyway. Rotation then settles on the prior-best arm
        # so the ramp->explore transition lands on it without an
        # arm-switch resync. Full-epoch exploration afterwards follows
        # the DOMINANCE rule (see _epoch_tick): arms deeper than the
        # chunk-prior best are dominated (worse on chunks AND slower
        # turnover) and skip their up-front epoch + drain; shallower
        # arms — the ones chunk rates structurally under-rank — are
        # always epoch-measured. Skipped arms still get real epoch
        # measurements eventually via the lazy reprobe cycle.
        self._ramp_chunks = 0
        self._ramp_rotations = 2      # full cycles through the arms
        self._best_wall_pc = None     # best observed wall per completion
        self._ep_history = []         # per-epoch observability records
        self._resync = False          # one-shot admission re-sync flag
        self.eos_token_id = eos_token_id
        self.scfg = SamplingConfig(temperature, top_k, top_p)
        self.prompt_bucket = prompt_bucket
        self.steps_per_sync = max(1, int(steps_per_sync))
        # prefill_extra widens EVERY verify window by this many tokens so
        # piggybacked prompts advance gamma+extra per step. Built and
        # measured NEGATIVE on v5e at 13B (wider window ~doubles step
        # cost, -30% aggregate — docs/PERFORMANCE.md), so default 0.
        self.prefill_extra = int(prefill_extra)
        # cap padded-kb x bucket per admission dispatch: the prefill's
        # deferred all-layers k/v stack (models/llama.py paged_prefill)
        # costs ~L*H_kv*D*4 bytes per admitted token — budget it so the
        # one-shot pool write never rivals the pools themselves
        self.prefill_token_budget = max(int(prefill_token_budget), 1)
        self.max_new_cap = max_new_cap
        max_pages = max_pages_per_req or num_blocks
        # prefix caching: refcounted pages + an LRU registry of computed
        # prompt-prefix KV (vLLM-style automatic prefix caching) — repeat
        # system prompts skip their prefill entirely
        self.prefix_cache = bool(prefix_cache)
        self.extend_chunk = int(extend_chunk)
        # dp partitioning (VERDICT r2 ask #5): with a dp>1 mesh, batch
        # rows AND the block pool split statically over dp — rows
        # [s*B/dp, (s+1)*B/dp) live on shard s over its own N/dp-block
        # pool half, managed by a PER-SHARD host allocator handing out
        # SHARD-LOCAL block ids. Device entry points run under
        # shard_map (manual dp, auto tp): the steady state has zero
        # cross-dp collectives — each shard is an independent sub-engine,
        # and throughput scales with dp x tp instead of tp alone.
        # Prefix-cache sharing is per-shard (pages physically live in one
        # shard's pool half).
        from ..parallel.sharding import DP_AXIS

        self.dp = int(mesh.shape[DP_AXIS]) if mesh is not None else 1
        if self.dp > 1:
            assert batch_rows % self.dp == 0, (
                f"batch_rows={batch_rows} must divide over dp={self.dp}")
            assert num_blocks % self.dp == 0, (
                f"num_blocks={num_blocks} must divide over dp={self.dp}")
        self._rows_local = batch_rows // self.dp
        blocks_local = num_blocks // self.dp
        assert max_pages <= blocks_local, (
            f"max_pages_per_req={max_pages} exceeds a dp shard's "
            f"{blocks_local}-block pool half")
        alloc_cls = SharedPageAllocator if prefix_cache else PageAllocator
        self._allocs = [
            alloc_cls(blocks_local, page, max_pages) for _ in range(self.dp)
        ]
        self.allocator = self._allocs[0]  # dp==1 back-compat alias
        self._table_sentinel = blocks_local
        self._max_pages = max_pages
        self.t_max = max_pages * page

        cfg_d, cfg_t = bundle_d.cfg, bundle_t.cfg
        b = batch_rows
        key = jax.random.key(seed)
        self._admit_key, step_key = jax.random.split(key)
        # pad-to-128 lane rescue (VERDICT r2 ask #6): a sub-128 head_dim
        # pool (e.g. the llama-68m / opt-125m DRAFT at D=64) allocated at
        # D=128 rides the NATIVE paged flash lane instead of the
        # materializing XLA gather fallback (the folded sub-128 lane
        # wedges Mosaic on real chips — kernels/flash_decode.py
        # should_use_paged). Cost: 2x that model's pool bytes — trivial
        # for draft pools. Auto: on real TPU whenever flash isn't off.
        if pool_pad_128 is None:
            pool_pad_128 = (
                jax.default_backend() == "tpu"
                and cfg_d.flash != "off" and cfg_t.flash != "off"
            )
        self.pool_pad_128 = bool(pool_pad_128)

        def pool_d(cfg):
            d = cfg.head_dim
            if self.pool_pad_128 and d < 128 and 128 % d == 0:
                return 128
            return d

        self.state = PagedBatchState(
            tokens=jnp.zeros((b, self.t_max), jnp.int32),
            cur_len=jnp.full((b,), 2, jnp.int32),
            draft_cache=init_paged_cache(
                cfg_d.num_layers, num_blocks, cfg_d.num_kv_heads, page,
                pool_d(cfg_d), b, max_pages, cfg_d.jnp_dtype, quant=kv_quant,
            ),
            target_cache=init_paged_cache(
                cfg_t.num_layers, num_blocks, cfg_t.num_kv_heads, page,
                pool_d(cfg_t), b, max_pages, cfg_t.jnp_dtype, quant=kv_quant,
            ),
            key=jax.random.split(step_key, b),
            active=jnp.zeros((b,), bool),
            done=jnp.ones((b,), bool),
            prefill_to=jnp.zeros((b,), jnp.int32),
            target_len=jnp.full((b,), self.t_max, jnp.int32),
            accepted=jnp.zeros((b,), jnp.int32),
            resamples=jnp.zeros((b,), jnp.int32),
            bonus=jnp.zeros((b,), jnp.int32),
            steps=jnp.zeros((b,), jnp.int32),
            acc_rate_sum=jnp.zeros((b,), jnp.float32),
            acc_len_hist=jnp.zeros((b, max_new_cap), jnp.int32),
        )

        if self.dp > 1:
            # shard-LOCAL table sentinel (each shard's pool half has
            # blocks_local blocks; init_paged_cache wrote the global one)
            def fix_tables(cache):
                return dataclasses.replace(
                    cache, block_tables=jnp.full_like(
                        cache.block_tables, self._table_sentinel))

            self.state = self.state._replace(
                draft_cache=fix_tables(self.state.draft_cache),
                target_cache=fix_tables(self.state.target_cache),
            )

        # multi-chip: params megatron-sharded over tp; pool kv-heads over
        # tp and blocks over dp; rows over dp (shard_paged_state)
        self.mesh = mesh
        self._dp_fns = None
        if mesh is not None:
            from ..parallel.sharding import (
                param_specs, shard_paged_state, shard_params,
            )

            self.params_d = shard_params(
                params_d, param_specs(bundle_d.family, bundle_d.cfg), mesh)
            self.params_t = shard_params(
                params_t, param_specs(bundle_t.family, bundle_t.cfg), mesh)
            self.state = shard_paged_state(self.state, mesh)
            if self.dp > 1:
                self._dp_fns = _build_dp_fns(
                    mesh, self.state, bundle_d, bundle_t, gamma, self.scfg,
                    eos_token_id, self.steps_per_sync, self.prefill_extra)
                self._dp_gamma = gamma
                self._dp_chunk_cache = {gamma: self._dp_fns["chunk"]}

        self._next_rid = 0
        self._pending: collections.deque[Request] = collections.deque()
        self._row_req: list[Optional[Request]] = [None] * b
        self._row_blocks: list[Optional[list]] = [None] * b
        self._row_gen: list[int] = [0] * b
        self.completions: dict[int, Completion] = {}
        # on-demand paging (vLLM-style, VERDICT r4 ask #2): admission
        # reserves only the prompt's pages plus a two-chunk decode runway
        # (the scheduler's knowledge of a row's length lags the one-deep
        # pipeline by two chunks), and _ensure_runway appends pages as
        # lengths grow — HBM holds Σ(actual lengths + runway) instead of
        # Σ(per-request worst case). On pool exhaustion the YOUNGEST row
        # (highest rid) is preempted: its pages free, it requeues at the
        # queue front carrying its committed tokens + evolved PRNG key,
        # and the resumed run replays bit-identically (determinism; see
        # tests/test_paged_engine.py preemption parity). on_demand=False
        # keeps legacy worst-case reservation for A/B measurement.
        #
        # ``overcommit`` gates ADMISSION on worst-case COMMITMENT
        # accounting: a request is admitted only while
        # Σ(resident rows' worst-case pages) + its own ≤ pool ×
        # overcommit. Default 1.0 = never admit beyond what the pool can
        # sustain at full length — zero steady-state preemptions, same
        # admission depth as legacy, but pages physically allocate lazily
        # (unreached tails stay free for the prefix-cache registry and
        # early-EOS headroom). overcommit > 1 admits deeper (much better
        # TTFT) and pays preemption churn when requests actually run to
        # their worst case — MEASURED on the EOS-less longgen 13B
        # workload: overcommit 2 served 131 tok/s vs 540 legacy (18
        # preempt/replay cycles); it is a knob for EOS-heavy traffic
        # where typical lengths sit far below max_new, not a default.
        self.on_demand = bool(on_demand)
        self.overcommit = float(overcommit)
        self._commit_pages = [0] * self.dp   # per-shard worst-case pages
        self._row_commit: list[int] = [0] * batch_rows
        # True-SARATHI PIGGYBACK prefill (VERDICT r4 ask #5; v2 in round
        # 5): with chunked_prefill=True, a cold admission whose uncached
        # prompt suffix exceeds extend_chunk tokens is installed with
        # cur_len = cached+1 and prefill_to = p_len — the decode chunks'
        # own verify passes then compute its target KV, gamma prompt
        # tokens per step, at ZERO extra target-weight reads (the
        # 13.2 GB verify read happens for the decode rows regardless);
        # only the cheap draft is prefilled up front via draft-only
        # windows. Running rows never see a monolithic prompt forward
        # stall, and the cold row's decode stream is bit-identical to
        # the monolithic engine's (the PRNG key is frozen through
        # prefill). Measured in scripts/bench_chunked_prefill.py /
        # docs/PERFORMANCE.md.
        self.chunked_prefill = bool(chunked_prefill)
        self.interleaved_chunks = 0   # decode chunks that carried a
        #                               piggyback-prefilling row
        gam_max = max(self._gamma_choices) if self._gamma_choices else gamma
        self._gam_max = gam_max
        self._chunk_runway = self.steps_per_sync * (gam_max + 1) + gam_max + 1
        self._row_len: list[int] = [0] * b
        self._row_done: list[bool] = [False] * b
        self._deact_rows: set[int] = set()
        self._tables_dirty = False
        self._last_harvest = None
        self._last_harvest_gens: Optional[tuple] = None
        self.preemptions = 0
        # staged rows' deferred prefix-page publication:
        # row -> (row_gen, hashes, blocks_prefix); registered by _harvest
        # once the piggyback prefill completes (see _stage_admission)
        self._pending_reg: dict = {}

    # --------------------------------------------------------------- interface
    def warmup(self, prompt_lens=(8,)) -> None:
        """Pre-compile every steady-state program (mirror of
        serve/scheduler.py warmup): for each prompt bucket, admission
        waves sized to hit each power-of-two prefill batch kb, plus the
        decode chunk. Remote compilation costs seconds per distinct
        program — never pay that on a live request."""
        rng = np.random.default_rng(0)
        rid0 = self._next_rid
        rids = []
        if self._gamma_choices:
            # precompile every adaptive-gamma arm's chunk program so arm
            # exploration never pays a compile on live traffic
            for g in self._gamma_choices:
                self.gamma = g
                rids.append(self.submit(rng.integers(2, 100, size=8), 2))
                self.run_until_idle()
        kbs = [kb for kb in (1, 2, 4, 8) if kb <= self.batch_rows] or [1]
        for p_len in prompt_lens:
            for kb in kbs:
                rids += [
                    self.submit(rng.integers(2, 100, size=max(int(p_len), 2)), 2)
                    for _ in range(kb)
                ]
                self.run_until_idle()
            if self.prefix_cache and int(p_len) >= self.page + 2:
                # compile the prefix-hit path too (extend chunks + finalize)
                same = rng.integers(2, 100, size=int(p_len))
                for _ in range(2):
                    rids.append(self.submit(same, 2))
                    self.run_until_idle()
        if self.chunked_prefill:
            # compile the piggyback admission programs (draft-only extend
            # windows + finalize-at-cur0) so a live long cold prompt
            # never pays remote compilation. Staging only engages while
            # some row is DECODING, so park a request in decode first,
            # then submit the long prompt. The parked request's budget
            # must exceed one chunk's worst-case commit
            # (steps_per_sync x (gamma+1)) or it can FINISH inside the
            # single step below — step()'s synchronous harvest then
            # frees the row, the decode-gate sees nothing to protect,
            # and the long prompt goes monolithic, leaving the staged
            # programs uncompiled (whether that happened depended on
            # the warmup acceptance draws — nondeterministic coverage).
            # capped so the parked request stays admittable on small
            # pools (submit rejects p_len+max_new+gam+1 > t_max; tiny
            # configs that can't park past one chunk keep the old race,
            # but can't serve real piggyback traffic anyway)
            park_new = max(
                min(self.steps_per_sync * (self._gam_max + 1) + 8,
                    self.t_max - 8 - self._gam_max - 1), 2)
            rids.append(self.submit(rng.integers(2, 100, size=8), park_new))
            self.step()
            long_p = rng.integers(2, 100, size=2 * self.extend_chunk + 2)
            rids.append(self.submit(long_p, 2))
            self.run_until_idle()
        for r in rids:
            self.completions.pop(r, None)
        if self._gamma_choices:
            # reset the controller AFTER all warmup traffic (ADVICE r4):
            # the main prefill/decode waves above complete real requests,
            # and a controller reset placed before them let those 2-token
            # warmup completions close epochs — live traffic then started
            # mid-'explore' on a non-ramp arm with garbage _ep_rate
            # entries half-weighted into later exploit decisions
            self._arm_rate.clear()
            self._arm_visits = {}
            self._chunk_count = 0
            self._acc_ema = None
            self._ep_rate.clear()
            self._ep_phase = "ramp"
            self._ep_count = 0
            self._best_wall_pc = None
            self._ep_history = []
            self._resync = False
            self._ep_incumbent = None
            self._ramp_chunks = 0
            self._epoch_reset()
            self._last_fetch_t = None
            self.gamma = (
                self._gamma_choices[0] if self._ag_mode == "epoch"
                else self._gamma_choices[len(self._gamma_choices) // 2])
        # warmup must not shift live traffic's rid sequence: per-request
        # PRNG is fold_in(admit_key, rid), so a shifted numbering changes
        # every request's acceptance draws — measured to de-synchronize
        # the completion waves of an otherwise identical run (and the
        # number of warmup submissions varies with config, e.g. one per
        # adaptive-gamma arm, making configs incomparable)
        self._next_rid = rid0

    def submit(self, prompt_ids, max_new_tokens: int = 40) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.submit_with_rid(rid, prompt_ids, max_new_tokens)
        return rid

    def submit_with_rid(self, rid: int, prompt_ids, max_new_tokens: int = 40):
        """Enqueue under a caller-chosen rid — the multi-host driver
        (serve/multihost.py PagedMultiHostDriver) broadcasts host 0's
        (rid, prompt, max_new) plan and every host injects the identical
        request stream, after which the engine's deterministic host loop
        (admission order, per-shard allocators, fold_in(admit_key, rid)
        PRNG) evolves identically everywhere."""
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if ids.shape[0] < 2:
            raise ValueError("prompt must have at least 2 tokens")
        max_new = min(int(max_new_tokens), self.max_new_cap)
        gam_max = max(self._gamma_choices) if self._gamma_choices else self.gamma
        if ids.shape[0] + max_new + gam_max + 1 > self.t_max:
            raise ValueError("request exceeds max pages per request")
        self._pending.append(Request(rid, ids, max_new, time.perf_counter()))

    def submit_request(self, req: Request):
        """Inject a recovered (possibly resume-carrying) Request — the
        multi-host failover path (serve/multihost.py recover_requests):
        a fresh engine continues preempted work bit-for-bit via the
        carried committed tokens + evolved PRNG key."""
        self._pending.append(req)

    def drain_requests(self) -> list:
        """Empty the engine's host scheduler into resumable Requests:
        preempt every running row (resume snapshot from the last
        harvested chunk metadata — no device access, so this works even
        when the mesh died mid-run), cancel staged admissions back to
        their original Requests, and hand back the pending queue. Used
        by multi-host failure recovery."""
        for row in range(self.batch_rows):
            if self._row_req[row] is not None:
                self._preempt_row(row)
        out = list(self._pending)
        self._pending.clear()
        return out

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self._row_req)

    def _admit(self):
        free_rows = [i for i, r in enumerate(self._row_req) if r is None]
        if self._resync:
            if len(free_rows) < min(self.batch_rows, len(self._pending)):
                return  # hold until a full wave of rows is free
            self._resync = False
            # restart the epoch: the drain's stragglers belong to the
            # previous arm and idle-row time to neither — the new arm's
            # measurement starts from the re-synced wave
            self._ep_tokens = 0
            self._ep_completions = 0
            self._ep_start = None
        while free_rows and self._pending:
            batch = []  # (row, req, padded, p_len, blocks, cached_len, hashes)
            bucket = None
            while free_rows and self._pending and len(batch) < 8:
                nxt = self._pending[0]
                padded, p_len = pad_prompt(nxt.prompt, self.prompt_bucket)
                if bucket is None:
                    bucket = padded.shape[-1]
                elif padded.shape[-1] != bucket:
                    break
                # padded-kb x bucket stays within the prefill token budget
                kb_next = 1 << max(len(batch), 0).bit_length() if batch else 1
                if batch and kb_next * bucket > self.prefill_token_budget:
                    break
                gam_max = (max(self._gamma_choices) if self._gamma_choices
                           else self.gamma)
                worst_total = p_len + nxt.max_new_tokens + gam_max + 1
                total = worst_total
                if self.on_demand:
                    # reserve prompt + a two-chunk decode runway only;
                    # _ensure_runway appends pages as the row grows
                    total = min(total, p_len + 2 * self._chunk_runway)
                # dp: the row decides the shard, the shard's allocator
                # hands out shard-local block ids. Try every shard that
                # still has a free row (ADVICE r3 #4): pinning admission
                # to free_rows[0]'s shard head-of-line-blocks the queue
                # when that one shard's pool is full while others idle.
                # Row order is deterministic, so multi-host admission
                # stays in lockstep.
                hashes = (prompt_page_hashes(nxt.prompt, self.page)
                          if self.prefix_cache else [])
                row, blocks, cached_len = None, None, 0
                tried_shards = set()
                for cand in free_rows:
                    shard = cand // self._rows_local
                    if shard in tried_shards:
                        continue
                    tried_shards.add(shard)
                    alloc = self._allocs[shard]
                    if self.prefix_cache:
                        got = alloc.alloc_shared(total, hashes)
                        if got is None:
                            continue
                        blocks, cached_len = got
                    else:
                        blocks = alloc.alloc(total)
                        if blocks is None:
                            continue
                    # commitment watermark: the shard must be able to
                    # sustain this request at full length without
                    # preempting (see the overcommit note in __init__).
                    # Prefix-SHARED pages are excluded — they were
                    # committed by their first holder, and double-
                    # charging every sharer would admit FEWER requests
                    # than legacy reservation on shared-prefix
                    # workloads. (When the first holder leaves while
                    # sharers remain, those pages briefly go
                    # uncommitted — a bounded exposure the preemption
                    # safety net covers.)
                    wp = alloc.pages_needed(worst_total) - cached_len // self.page
                    if self.on_demand and (
                            self._commit_pages[shard] + wp
                            > alloc.num_blocks * self.overcommit):
                        alloc.free(blocks)
                        blocks, cached_len = None, 0
                        continue  # keep queued; try another shard
                    row = cand
                    if self.on_demand:
                        # charge NOW so later admissions in this same
                        # batch see the commitment
                        self._commit_pages[shard] += wp
                        self._row_commit[row] = wp
                    break
                if row is None:
                    break  # every shard with a free row is full: keep queued
                self._pending.popleft()
                free_rows.remove(row)
                batch.append(
                    (row, nxt, np.asarray(padded).reshape(-1),
                     p_len, blocks, cached_len, hashes)
                )
            if not batch:
                break
            inline, staged = [], []
            # piggyback-staging exists to PROTECT decoding rows from a
            # monolithic prompt-forward stall; with no row currently
            # decoding there is nothing to protect and the monolithic
            # prefill is strictly faster (piggyback advances only
            # gamma x steps_per_sync prompt tokens per chunk)
            decoding_rows = any(
                r is not None and self._row_len[row] >= len(r.prompt)
                and not self._row_done[row]
                for row, r in enumerate(self._row_req))
            for e in batch:
                if (self.chunked_prefill and decoding_rows
                        and e[3] - e[5] > self.extend_chunk):
                    staged.append(e)
                else:
                    inline.append(e)
            misses = [e for e in inline if e[5] == 0]
            hits = [e for e in inline if e[5] > 0]
            if misses:
                self._dispatch_prefill(misses, bucket)
            if hits:
                self._dispatch_extend(hits, bucket)
            if staged:
                self._stage_admission(staged, bucket)
            now = time.perf_counter()
            for row, req, _, p_len, blocks, cached_len, hashes in inline:
                if req.prefill_time is None:  # resumed rows keep TTFT
                    req.prefill_time = now
                req.cached_len = cached_len
                self._row_req[row] = req
                self._row_blocks[row] = blocks
                self._row_gen[row] += 1
                self._row_len[row] = p_len
                self._row_done[row] = False
                if self.prefix_cache and hashes:
                    # publish the full prompt pages this request now holds
                    # (shared ones are already registered; register is
                    # first-writer-wins for the fresh tail). dp: registered
                    # in the row's shard registry — sharing is per-shard.
                    self._allocs[row // self._rows_local].register(
                        hashes, blocks[: len(hashes)])

    # ---------------------------------------------- on-demand paging
    def _target_total(self, req: Request) -> int:
        """The row's final length target (prompt + remaining budget)."""
        return len(req.prompt) + req.max_new_tokens

    def _ensure_runway(self):
        """Grow each active row's block table to cover the next two decode
        chunks (the scheduler's view of a row's length lags the one-deep
        pipeline by two chunks). On pool exhaustion, preempt the youngest
        row in the needy row's shard — vLLM-style recompute preemption."""
        if not self.on_demand:
            return
        page = self.page
        for row in range(self.batch_rows):
            req = self._row_req[row]
            if req is None or self._row_done[row]:
                continue
            # coverage target: two chunks of worst-case advance past the
            # last KNOWN length, capped at the request's worst case
            # (target_total + gamma + 1 — KV writes never pass
            # target_len + gamma, and this cap must EQUAL the admission
            # commitment basis or growth exceeds commitment and
            # overcommit=1.0 still preempts: measured 12 preemptions on
            # the mixed 13B workload with a chunk_runway margin here) and
            # at the block table's width
            need = min(self._row_len[row] + 2 * self._chunk_runway,
                       self._target_total(req) + self._gam_max + 1,
                       self.t_max)
            shard = row // self._rows_local
            alloc = self._allocs[shard]
            while (self._row_req[row] is not None
                   and len(self._row_blocks[row]) * page < need):
                blk = alloc.alloc_one()
                if blk is not None:
                    self._row_blocks[row].append(blk)
                    self._tables_dirty = True
                    continue
                victim = self._pick_victim(shard)
                if victim is None:
                    break  # nothing to preempt; retry next step
                if victim == row and alloc.num_blocks * page < need:
                    raise RuntimeError(
                        f"request {req.rid} needs {need} cache positions "
                        f"but the shard pool holds only "
                        f"{alloc.num_blocks * page}")
                self._preempt_row(victim)
                # if the needy row preempted itself the outer while's
                # req-is-None guard exits

    def _pick_victim(self, shard: int) -> Optional[int]:
        """Youngest (highest-rid) running row in the shard: FCFS-fair, and
        resumed requests (old rids) are automatically protected."""
        cands = [
            r for r in range(shard * self._rows_local,
                             (shard + 1) * self._rows_local)
            if self._row_req[r] is not None and not self._row_done[r]
        ]
        if not cands:
            return None
        return max(cands, key=lambda r: self._row_req[r].rid)

    def _preempt_row(self, row: int):
        """Free the row's pages and requeue its request at the queue
        front, resuming from the last harvested snapshot: committed
        tokens become the resume prompt and the row's evolved PRNG key
        rides along, so the resumed run replays the preempted
        continuation (any in-flight chunk work since the snapshot is
        redone deterministically). Replay is BIT-identical whenever the
        prefill recompute is bit-equal to the original decode-path
        computation — true under fp32/highest matmul precision (pinned
        by tests/test_paged_engine.py::test_preemption_parity...); on
        TPU default precision the re-prefilled KV can differ in low
        bits and a sampled token occasionally flips at a top-k/accept
        boundary (measured on chip: 2 of 3 preempted requests still
        bit-identical) — the same distribution-exact-but-not-
        bit-deterministic contract as any recompute preemption.
        The in-flight chunk may still write the freed pages, but the
        device stream orders those writes before any later owner's, and
        no position is read before its owner writes it — stale data is
        unreachable."""
        req = self._row_req[row]
        shard = row // self._rows_local
        hv, gens = self._last_harvest, self._last_harvest_gens
        resume = req
        if (hv is not None and gens is not None
                and gens[row] == self._row_gen[row]
                and int(hv["steps"][row]) > 0):
            cur = int(hv["cur_len"][row])
            toks = np.asarray(hv["tokens"][row][:cur], np.int32).copy()
            orig_plen = (req.orig_prompt_len if req.orig_prompt_len is not None
                         else len(req.prompt))
            prev = req.carry or {}
            steps = int(hv["steps"][row])
            carry = {
                "steps": prev.get("steps", 0) + steps,
                "accepted": prev.get("accepted", 0) + int(hv["accepted"][row]),
                "resamples": prev.get("resamples", 0) + int(hv["resamples"][row]),
                "bonus": prev.get("bonus", 0) + int(hv["bonus"][row]),
                "acc_rate_sum": prev.get("acc_rate_sum", 0.0)
                + float(hv["acc_rate_sum"][row]),
                "acc_len": prev.get("acc_len", [])
                + np.asarray(hv["acc_len_hist"][row])[:steps].tolist(),
                "gamma_steps": prev.get("gamma_steps", 0) + steps * self.gamma,
                "prefix_cached_tokens": prev.get(
                    "prefix_cached_tokens", req.cached_len),
                "target_total": prev.get(
                    "target_total", orig_plen + req.max_new_tokens),
            }
            remaining = carry["target_total"] - cur
            resume = Request(
                req.rid, toks, max(remaining, 0), req.submit_time,
                prefill_time=req.prefill_time, cached_len=0,
                resume_key=np.asarray(hv["key_data"][row], np.uint32).copy(),
                carry=carry, orig_prompt_len=orig_plen,
            )
        self._allocs[shard].free(self._row_blocks[row])
        # never publish a preempted row's prefix pages: its piggyback
        # prefill did not complete, so the pages' target KV is garbage
        self._pending_reg.pop(row, None)
        self._commit_pages[shard] -= self._row_commit[row]
        self._row_commit[row] = 0
        self._row_req[row] = None
        self._row_blocks[row] = None
        self._row_gen[row] += 1
        self._row_done[row] = False
        self._deact_rows.add(row)
        self._tables_dirty = True
        self._pending.appendleft(resume)
        self.preemptions += 1

    def _flush_maintenance(self):
        """Push the host allocator's table mirror + pending deactivations
        to the device in one tiny dispatch (before the next chunk)."""
        if not (self._tables_dirty or self._deact_rows):
            return
        tables = np.full((self.batch_rows, self._max_pages),
                         self._table_sentinel, np.int32)
        for row in range(self.batch_rows):
            blocks = self._row_blocks[row]
            if blocks:
                shard = row // self._rows_local
                tables[row] = self._allocs[shard].table_row(blocks)
        deact = np.zeros((self.batch_rows,), bool)
        for r in self._deact_rows:
            deact[r] = True
        args = (jnp.asarray(tables), jnp.asarray(deact))
        if self._dp_fns is not None:
            self.state = self._dp_fns["maintain"](self.state, *args)
        else:
            self.state = _paged_maintain(self.state, *args)
        self._deact_rows.clear()
        self._tables_dirty = False

    def _admission_arrays(self, batch, bucket):
        """Admission tensors, dp-segmented: [dp * kbs] where segment s
        carries shard s's admissions (shard-LOCAL row ids and block ids),
        padded to a shared power-of-two kbs. dp==1 degenerates to the
        plain [kb] layout. Row sentinel = rows-per-shard (scatters drop);
        table sentinel = blocks-per-shard (pool writes drop)."""
        groups = [[] for _ in range(self.dp)]
        for e in batch:
            groups[e[0] // self._rows_local].append(e)
        per = max(len(g) for g in groups)
        kbs = 1 << (per - 1).bit_length()
        kb = self.dp * kbs
        rows = np.full((kb,), self._rows_local, np.int32)
        tables = np.full((kb, self._max_pages), self._table_sentinel, np.int32)
        prompts = np.zeros((kb, bucket), np.int32)
        p_lens = np.full((kb,), 2, np.int32)
        max_news = np.zeros((kb,), np.int32)
        cached = np.zeros((kb,), np.int32)
        rid_at = np.full((kb,), -1, np.int64)
        key_at: list = [None] * kb
        for s, g in enumerate(groups):
            alloc = self._allocs[s]
            for j, (row, req, padded, p_len, blocks, cached_len, _h) in enumerate(g):
                i = s * kbs + j
                rows[i] = row - s * self._rows_local  # shard-local id
                tables[i] = alloc.table_row(blocks)
                prompts[i] = padded
                p_lens[i] = p_len
                max_news[i] = req.max_new_tokens
                cached[i] = cached_len
                rid_at[i] = req.rid
                key_at[i] = req.resume_key

        def slot_key(i):
            if key_at[i] is not None:
                # preemption resume: the row's evolved key, so the
                # continuation's draws replay bit-identically
                return jax.random.wrap_key_data(
                    jnp.asarray(key_at[i], jnp.uint32))
            if rid_at[i] >= 0:
                return jax.random.fold_in(self._admit_key, int(rid_at[i]))
            return jax.random.fold_in(self._admit_key, 2**31 - 1)

        keys = jnp.stack([slot_key(i) for i in range(kb)])
        return rows, tables, prompts, p_lens, max_news, cached, keys

    def _dispatch_prefill(self, batch, bucket):
        rows, tables, prompts, p_lens, max_news, _c, keys = self._admission_arrays(
            batch, bucket
        )
        args = (jnp.asarray(rows), jnp.asarray(tables), jnp.asarray(prompts),
                jnp.asarray(p_lens), jnp.asarray(max_news), keys)
        if self._dp_fns is not None:
            self.state = self._dp_fns["prefill"](
                self.params_d, self.params_t, self.state, *args)
        else:
            self.state = _paged_prefill(
                self.params_d, self.params_t, self.state, *args,
                bundle_d=self.bundle_d, bundle_t=self.bundle_t,
            )

    def _extend_n_chunks(self, arrays, batch) -> int:
        _rows, _t, _p, p_lens, _m, cached, _k = arrays
        w = self.extend_chunk
        return int(max(
            -(-(int(p) - int(c)) // w) for p, c in zip(p_lens[: len(batch)],
                                                       cached[: len(batch)])
        ))

    def _extend_window(self, arrays, batch, j: int, draft_only: bool = False):
        """Dispatch chunk ``j`` of a chunked prefill: run both models
        (or, for piggyback admissions, the DRAFT only) over the [KB, W]
        prompt window at offset cached + j*W through the normal paged
        decode path (the flash kernel's new-block ceiling is 32). Rows
        whose prompt is exhausted carry sentinel tables."""
        rows, tables, prompts, p_lens, max_news, cached, keys = arrays
        w = self.extend_chunk
        kb = rows.shape[0]
        sentinel = np.full_like(tables, self._table_sentinel)
        lens_now = cached + j * w
        live = lens_now < p_lens
        lens_d = np.where(live, lens_now, 0).astype(np.int32)
        tab_d = np.where(live[:, None], tables, sentinel).astype(np.int32)
        window = np.zeros((kb, w), np.int32)
        for r in range(len(batch)):
            if not live[r]:
                continue
            s0 = int(lens_now[r])
            take = min(w, int(p_lens[r]) - s0)
            window[r, :take] = prompts[r, s0 : s0 + take]
        ext_args = (jnp.asarray(tab_d), jnp.asarray(lens_d), jnp.asarray(window))
        if draft_only:
            if self._dp_fns is not None:
                self.state = self._dp_fns["extend_draft"](
                    self.params_d, self.state, *ext_args)
            else:
                self.state = _paged_draft_extend(
                    self.params_d, self.state, *ext_args,
                    bundle_d=self.bundle_d)
        elif self._dp_fns is not None:
            self.state = self._dp_fns["extend"](
                self.params_d, self.params_t, self.state, *ext_args)
        else:
            self.state = _paged_extend_chunk(
                self.params_d, self.params_t, self.state, *ext_args,
                bundle_d=self.bundle_d, bundle_t=self.bundle_t,
            )

    def _finalize_admission(self, arrays, cur0=None):
        rows, tables, prompts, p_lens, max_news, _cached, keys = arrays
        c0 = jnp.asarray(cur0 if cur0 is not None else p_lens, jnp.int32)
        fin_args = (jnp.asarray(rows), jnp.asarray(tables), jnp.asarray(prompts),
                    jnp.asarray(p_lens), jnp.asarray(max_news), keys, c0)
        if self._dp_fns is not None:
            self.state = self._dp_fns["finalize"](self.state, *fin_args)
        else:
            self.state = _paged_finalize(self.state, *fin_args)

    def _dispatch_extend(self, batch, bucket):
        """Prefix-cache-hit admission: the first ``cached_len`` positions'
        KV already sits in shared pool pages; compute only the suffix in
        W-token chunks, then install the rows."""
        arrays = self._admission_arrays(batch, bucket)
        for j in range(self._extend_n_chunks(arrays, batch)):
            self._extend_window(arrays, batch, j)
        self._finalize_admission(arrays)

    # -------------------------------------------- SARATHI chunked prefill
    def _stage_admission(self, batch, bucket):
        """True-SARATHI piggyback admission (round 5, v2): install the
        rows immediately with ``cur_len = cached_len + 1`` and
        ``prefill_to = p_len`` — the cold prompt's TARGET KV is then
        computed inside subsequent decode chunks' verify passes, gamma
        tokens per step, at ZERO extra weight reads (see prefill_to in
        PagedBatchState; the +1 keeps verify's rollback-to-cur_len-1
        writes out of prefix-SHARED pages). Only the cheap draft model
        is prefilled up front, via draft-only extend windows. The row
        decodes the moment its cur_len reaches prefill_to, with a PRNG
        stream bit-identical to the monolithic-prefill engine's."""
        arrays = self._admission_arrays(batch, bucket)
        rows, tables, prompts, p_lens, max_news, cached, keys = arrays
        for j in range(self._extend_n_chunks(arrays, batch)):
            self._extend_window(arrays, batch, j, draft_only=True)
        cur0 = np.minimum(cached + 1, p_lens).astype(np.int32)
        self._finalize_admission(arrays, cur0=cur0)
        for row, req, _p, p_len, blocks, cached_len, hashes in batch:
            # prefill_time is NOT stamped here: the prompt's target KV
            # only arrives gamma tokens per chunk over the next many
            # chunks — _harvest stamps it when the host observes the
            # prefill complete (cur_len >= p_len), so a piggybacked
            # request's ttft_s includes its stretched-out prefill
            # instead of reading ~0 at staging (which overstated the
            # chunked-prefill TTFT win vs the monolithic path, whose
            # stamp at least follows the enqueued prompt computation).
            req.cached_len = cached_len
            self._row_req[row] = req
            self._row_blocks[row] = blocks
            self._row_gen[row] += 1
            self._row_len[row] = int(min(cached_len + 1, p_len))
            self._row_done[row] = False
            if self.prefix_cache and hashes:
                # DEFER publication until the piggyback prefill
                # completes: registering now would let a same-prefix
                # admission alloc_shared() pages whose target KV has not
                # been computed yet (garbage reads), and a preemption
                # would park never-written pages in the evictable LRU
                # for any later identical prompt to hit with no writer
                # left. The inline path can register at dispatch because
                # the device stream orders its prefill writes before any
                # later chunk's reads; here the writes live in FUTURE
                # chunks. _harvest registers once cur_len >= p_len.
                self._pending_reg[row] = (
                    self._row_gen[row], hashes, list(blocks[: len(hashes)]))

    def _n_prefilling(self) -> int:
        """Rows still piggyback-prefilling (host view: known length has
        not reached the submitted prompt's length)."""
        return sum(
            1 for row, req in enumerate(self._row_req)
            if req is not None and self._row_len[row] < len(req.prompt)
        )

    def _harvest(self, done: np.ndarray, cur_len: np.ndarray, gens: tuple):
        # host mirrors for on-demand growth/preemption: the freshest
        # per-row length/done knowledge, gen-gated against stale chunks
        self._last_harvest_gens = gens
        for i, r in enumerate(self._row_req):
            if r is not None and gens[i] == self._row_gen[i]:
                self._row_len[i] = int(cur_len[i])
                self._row_done[i] = bool(done[i])
                if r.prefill_time is None and self._row_len[i] >= len(r.prompt):
                    # piggybacked row's prefill just completed (host
                    # view); see the TTFT note in _stage_admission
                    r.prefill_time = time.perf_counter()
        if self._pending_reg:
            # staged rows' deferred prefix-page publication (see
            # _stage_admission): register once the prompt's target KV is
            # fully computed; drop entries invalidated by preemption/
            # completion-and-reuse (gen mismatch)
            for row in list(self._pending_reg):
                gen, hashes, blks = self._pending_reg[row]
                r = self._row_req[row]
                if r is None or gen != self._row_gen[row]:
                    del self._pending_reg[row]
                elif self._row_len[row] >= len(r.prompt):
                    self._allocs[row // self._rows_local].register(hashes, blks)
                    del self._pending_reg[row]
        fin = [i for i, r in enumerate(self._row_req)
               if r is not None and done[i] and gens[i] == self._row_gen[i]]
        if not fin:
            return
        # zero-fetch: everything below reads the chunk's own packed
        # metadata (unpacked by _meta_np from the pipelined async host
        # copy). Fetching self.state here would BLOCK on the in-flight
        # chunk's pending output whenever completions stagger across
        # chunks — see _pack_chunk_meta.
        hv = self._last_harvest
        toks_f, steps_f, hist_f, accr_f, acc_f, res_f, bon_f = (
            hv["tokens"], hv["steps"], hv["acc_len_hist"],
            hv["acc_rate_sum"], hv["accepted"], hv["resamples"], hv["bonus"],
        )
        for row in fin:
            req = self._row_req[row]
            p_len = req.prompt.shape[0]
            # preemption-resumed rows: user-visible prompt length and the
            # pre-preemption counters come from the carried snapshot
            orig_plen = (req.orig_prompt_len if req.orig_prompt_len is not None
                         else p_len)
            carry = req.carry or {}
            out = first_eos_truncate(
                toks_f[row], p_len, int(cur_len[row]), self.eos_token_id
            )
            steps = carry.get("steps", 0) + int(steps_f[row])
            # with adaptive_gamma the depth varied across this row's
            # steps; the current arm approximates the drafted-count
            # denominator (acc_rate is observability, not control)
            drafted = carry.get("gamma_steps", 0) + int(steps_f[row]) * self.gamma
            now = time.perf_counter()
            details = {
                "ttft_s": (req.prefill_time or now) - req.submit_time,
                "latency_s": now - req.submit_time,
                "acc_len": carry.get("acc_len", [])
                + np.asarray(hist_f[row])[: int(steps_f[row])].tolist(),
                "acc_rate": (carry.get("acc_rate_sum", 0.0) + float(accr_f[row]))
                / max(drafted, 1),
                "target_call_times": steps,
                "approx_call_times": steps,
                "accepted_count": carry.get("accepted", 0) + int(acc_f[row]),
                "resample_count": carry.get("resamples", 0) + int(res_f[row]),
                "target_sample_count": carry.get("bonus", 0) + int(bon_f[row]),
                "tokens_generated": len(out) - orig_plen,
                "prefix_cached_tokens": carry.get(
                    "prefix_cached_tokens", req.cached_len),
            }
            self.completions[req.rid] = Completion(req.rid, out, orig_plen, details)
            self._commit_pages[row // self._rows_local] -= self._row_commit[row]
            self._row_commit[row] = 0
            # _resync: the drain after an arm switch belongs to the OLD
            # arm; accumulating it would charge the drain to the NEW
            # arm's epoch (ADVICE r4 — the same '634 read as 499'
            # poisoning _resync exists to avoid). _admit zeroes the
            # counters anyway when the hold clears; skipping here also
            # keeps _epoch_tick from closing an epoch mid-drain.
            if (self._gamma_choices and self._ag_mode == "epoch"
                    and not self._resync):
                # charge only THIS residency's tokens: a preemption-
                # resumed request's pre-preemption tokens (carried in
                # tokens_generated via orig_plen) were produced under an
                # earlier epoch, possibly a different arm — crediting
                # them here would inflate the completing arm's measured
                # rate, the cross-epoch poisoning _resync exists to stop
                self._ep_tokens += max(len(out) - p_len, 0)
                self._ep_completions += 1
            self._allocs[row // self._rows_local].free(self._row_blocks[row])
            self._row_req[row] = None
            self._row_blocks[row] = None
            self.state = self.state._replace(
                active=self.state.active.at[jnp.asarray(row)].set(False)
            )

    def _dispatch_chunk(self):
        if not self._chunk_log:
            # pipeline drained: the next fetch gap would include idle /
            # admission time — don't charge it to any arm
            self._last_fetch_t = None
        if (self._gamma_choices and self._ag_mode == "epoch"
                and self._ep_start is None):
            # open the epoch when WORK starts (first chunk dispatch), not
            # at the first post-harvest tick — the late open undercounted
            # the ramp epoch's wall ~4x, poisoning both its recorded rate
            # and the wall-cap pace derived from it
            self._ep_start = time.perf_counter()
        if (self._gamma_choices and self._ag_mode == "epoch"
                and self._ep_phase == "ramp"):
            # ramp rotation (see __init__): cycle the arms for the first
            # _ramp_rotations passes, then settle on the chunk-prior best
            arms = self._gamma_choices
            k = self._ramp_chunks
            self._ramp_chunks = k + 1
            if k < self._ramp_rotations * len(arms):
                self.gamma = arms[k % len(arms)]
            else:
                self.gamma = max(
                    arms, key=lambda g: self._arm_rate.get(g, float("-inf")))
        self._chunk_log.append((self.gamma, max(self.num_active, 1)))
        if self._dp_fns is not None:
            if self._gamma_choices and self.gamma != self._dp_gamma:
                self._dp_chunk_cache.setdefault(
                    self.gamma, self._dp_fns["chunk_for_gamma"](self.gamma))
                fn = self._dp_chunk_cache[self.gamma]
            else:
                fn = self._dp_fns["chunk"]
            self.state, pack = fn(self.params_d, self.params_t, self.state)
            return pack
        self.state, pack = _paged_chunk(
            self.params_d, self.params_t, self.state,
            bundle_d=self.bundle_d, bundle_t=self.bundle_t,
            gamma=self.gamma, scfg=self.scfg,
            eos_token_id=self.eos_token_id, n_steps=self.steps_per_sync,
            prefill_extra=self.prefill_extra,
        )
        return pack

    def _meta_np(self, pack) -> np.ndarray:
        """Consume one chunk's packed meta+harvest vector (host copy was
        started asynchronously by the pipeline): unpack, stash the
        harvest payload for a zero-fetch ``_harvest``, feed the gamma
        controller, and return the legacy [cur_len | done] scheduling
        view."""
        from ..parallel.distributed import host_fetch

        g, live = self._chunk_log.popleft()
        now = time.perf_counter()
        wall = max(now - self._last_fetch_t, 1e-9) if self._last_fetch_t else None
        self._last_fetch_t = now
        if wall is not None:
            wall *= live  # normalize to per-row wall: arms sampled during
            # ramp-up (few live rows) otherwise read artificially low
        arr = np.asarray(host_fetch(pack))
        bl, h, t = self._rows_local, self.max_new_cap, self.t_max
        seg = arr.reshape(self.dp, -1)
        shards = [_unpack_chunk_meta(seg[s], bl, h, t) for s in range(self.dp)]
        merged = {
            k: np.concatenate([sh[k] for sh in shards])
            for k in ("cur_len", "done", "steps", "accepted", "resamples",
                      "bonus", "acc_rate_sum")
        }
        for k in ("acc_len_hist", "tokens", "key_data"):
            merged[k] = np.concatenate([sh[k] for sh in shards], axis=0)
        self._last_harvest = merged
        self._update_gamma(
            float(sum(sh["acc_delta"] for sh in shards)),
            float(sum(sh["step_delta"] for sh in shards)), g, wall)
        return np.concatenate(
            [merged["cur_len"], merged["done"].astype(np.int32)])

    def _update_gamma(self, acc_delta: float, step_delta: float,
                      used_gamma: int, wall: float):
        """Adaptive-gamma bandit: EMA each depth's MEASURED committed
        tokens per chunk wall; explore unvisited depths first, then
        exploit the best arm, re-probing the others every 16 chunks so
        drifting acceptance is tracked. An analytic tokens/round-cost
        model is deliberately not used for the choice — it misprices
        tail truncation and RTT amortization (docstring at the
        adaptive_gamma parameter); the acceptance inversion is kept only
        for reporting (self._acc_ema)."""
        if not self._gamma_choices or step_delta <= 0:
            return
        # per-token acceptance estimate for observability: invert
        # E[n] = a(1-a^g)/(1-a) by bisection
        mean_n = acc_delta / step_delta
        g = used_gamma
        lo, hi = 1e-4, 1.0 - 1e-4
        for _ in range(30):
            mid = 0.5 * (lo + hi)
            if mid * (1.0 - mid**g) / (1.0 - mid) < mean_n:
                lo = mid
            else:
                hi = mid
        a = 0.5 * (lo + hi)
        self._acc_ema = a if self._acc_ema is None else 0.7 * self._acc_ema + 0.3 * a

        if wall and wall > 0:
            # committed tokens ~= accepted + one bonus/resample per round
            rate = (acc_delta + step_delta) / wall
            prev = self._arm_rate.get(used_gamma)
            self._arm_rate[used_gamma] = (
                rate if prev is None else 0.6 * prev + 0.4 * rate)
            self._arm_visits = getattr(self, "_arm_visits", {})
            self._arm_visits[used_gamma] = (
                self._arm_visits.get(used_gamma, 0) + 1)
        self._chunk_count += 1

        if self._ag_mode == "epoch":
            # per-chunk rates stay maintained as the exploration-order
            # prior + acceptance observability, but the ARM CHOICE is
            # the epoch controller's alone (_epoch_tick)
            return

        # a MEASURED visit (wall recorded) per arm, twice, before
        # exploiting — idle-gap chunks record no rate and don't count;
        # then exploit with a runner-up probe every 8 chunks
        self._arm_visits = getattr(self, "_arm_visits", {})
        hungry = [g for g in self._gamma_choices
                  if self._arm_visits.get(g, 0) < 2]
        if hungry:
            self.gamma = hungry[0]
            return
        ranked = sorted(self._gamma_choices,
                        key=lambda g: self._arm_rate.get(g, float("-inf")),
                        reverse=True)
        if self._chunk_count % 8 == 0 and len(ranked) > 1:
            self.gamma = ranked[1]
        else:
            self.gamma = ranked[0]

    def _epoch_reset(self):
        """Drop the open epoch's partial accumulation (engine idle: wall
        from here on would be queue-starvation time, not arm quality).
        Learned per-arm rates survive."""
        self._ep_tokens = 0
        self._ep_completions = 0
        self._ep_start = None

    def _epoch_tick(self):
        """Close the epoch when enough requests completed, credit the
        current arm with the epoch's completed-request throughput, and
        pick the next arm. Switching ONLY here is the point: within-
        chunk rates cannot see request-turnover effects (the round-3
        bandit's structural failure — converged to gamma=8 at 380-399
        tok/s where fixed gamma=4 serves 612 on the saturated bench)."""
        if not self._gamma_choices or self._ag_mode != "epoch":
            return
        if self._resync:
            # admission hold in force: completions are old-arm drain and
            # are deliberately uncounted (_harvest) — a wall-cap closure
            # here would credit the drain window to the new arm
            return
        now = time.perf_counter()
        if self._ep_start is None:
            return  # no work dispatched yet (_dispatch_chunk opens it)
        wall = now - self._ep_start
        capped = (
            self._ep_phase in ("ramp", "explore", "probe")
            and self._best_wall_pc is not None
            and wall > self._ep_wall_cap * self._best_wall_pc * self._ep_size
        )
        if self._ep_completions < self._ep_size and not capped:
            return
        rate = self._ep_tokens / max(wall, 1e-9)
        ramp_mixed = self._ep_phase == "ramp"
        self._ep_history.append({
            "gamma": "mixed" if ramp_mixed else self.gamma,
            "phase": self._ep_phase,
            "completions": self._ep_completions,
            "wall_s": round(wall, 3),
            "tok_per_s": round(rate, 1),
            "capped": capped,
        })
        # every single-arm epoch is recorded: explore/probe rates are
        # biased a few % low by arm-switch disruption, but the incumbent
        # keeps being re-measured during exploit so the EMA washes that
        # out. The ROTATED ramp epoch is arm-mixed and credits no arm —
        # its yield is the per-chunk prior (_arm_rate) instead.
        if not ramp_mixed:
            prev = self._ep_rate.get(self.gamma)
            self._ep_rate[self.gamma] = (
                rate if prev is None else 0.5 * prev + 0.5 * rate)
        if not capped and self._ep_completions > 0:
            wpc = wall / self._ep_completions
            if self._best_wall_pc is None or wpc < self._best_wall_pc:
                self._best_wall_pc = wpc
        self._ep_count += 1
        # next arm: PLAUSIBLE unexplored arms first (ordered by the
        # per-chunk prior, best-looking first — the prior covers every
        # arm thanks to the rotated ramp), then exploit the best epoch
        # rate with a periodic probe so drifting workloads are tracked.
        # Plausibility is the DOMINANCE rule, not a rate threshold: chunk
        # rates systematically over-rank DEEPER arms (they cannot see
        # request-turnover effects — the round-3 structural failure, and
        # a measured ~45% bias on the uniform 13B workload where a 1.4x
        # rate gate wrongly excluded the true-best shallow arm), so an
        # arm SHALLOWER than the chunk-prior best must always be epoch-
        # measured, while an arm DEEPER than the chunk best is dominated
        # twice (worse on raw chunk throughput AND slower turnover) and
        # skips its up-front epoch + resync drain; the reprobe cycle
        # still measures it lazily.
        prior = sorted(self._gamma_choices,
                       key=lambda g: self._arm_rate.get(g, float("-inf")),
                       reverse=True)
        chunk_best = prior[0]

        def _plausible(g):
            return (g <= chunk_best
                    or self._arm_rate.get(g) is None)
        unexplored = [g for g in prior
                      if g not in self._ep_rate and _plausible(g)]
        prev_gamma = self.gamma
        if unexplored:
            self.gamma = unexplored[0]
            self._ep_phase = "explore"
        else:
            ranked = sorted((g for g in self._gamma_choices
                             if g in self._ep_rate),
                            key=lambda g: self._ep_rate[g], reverse=True)
            inc = self._ep_incumbent
            if inc not in self._gamma_choices or inc not in self._ep_rate:
                inc = ranked[0]
            elif (ranked[0] != inc and self._ep_rate[ranked[0]]
                  > self._ep_hysteresis * self._ep_rate[inc]):
                inc = ranked[0]  # challenger demonstrably better
            self._ep_incumbent = inc
            others = [g for g in prior if g != inc]
            if others and self._ep_count % self._ep_reprobe_every == 0:
                # cycle through ALL non-incumbent arms (including the
                # implausibility-skipped ones) so every arm eventually
                # gets a real epoch measurement
                idx = (self._ep_count // self._ep_reprobe_every - 1) % len(others)
                self.gamma = others[idx]
                self._ep_phase = "probe"
            else:
                self.gamma = inc
                self._ep_phase = "exploit"
        if self.gamma != prev_gamma:
            # ANY arm switch staggers the completion waves (rows end up
            # finishing at different chunks, and saturated admission then
            # reproduces the stagger every wave: extra partial chunk +
            # split prefill, ~20%/wave). Re-align by holding admissions
            # until a full wave of rows is free; _admit also restarts
            # the epoch when the hold clears, so the drain is charged
            # to NO arm (charging it to the new arm made a 634-tok/s
            # incumbent read 499 and flipped a run onto the wrong arm).
            self._resync = True
        self._ep_tokens = 0
        self._ep_completions = 0
        self._ep_start = now

    def adaptive_stats(self) -> dict:
        """Observability snapshot of the gamma controller."""
        return {
            "mode": self._ag_mode if self._gamma_choices else "fixed",
            "gamma": self.gamma,
            # the settled arm: self.gamma may transiently be a probe
            "incumbent": (self._ep_incumbent if self._ep_incumbent is not None
                          else self.gamma),
            "acc_ema": self._acc_ema,
            "epoch_rates": dict(self._ep_rate),
            "chunk_rates": dict(self._arm_rate),
            "epoch_phase": self._ep_phase,
            "epochs": self._ep_count,
            "epoch_history": list(self._ep_history),
        }

    def step(self) -> int:
        self._admit()
        self._ensure_runway()
        self._flush_maintenance()
        if self.num_active:
            if self._n_prefilling():
                self.interleaved_chunks += 1
            m = self._meta_np(self._dispatch_chunk())
            b = self.batch_rows
            self._harvest(m[b:].astype(bool), m[:b], tuple(self._row_gen))
            self._epoch_tick()
        else:
            self._epoch_reset()
        return self.num_active

    def run_until_idle(self, max_steps: int = 10_000):
        """Drain with the one-chunk-deep pipeline (dispatch chunk k+1
        before reading chunk k's metadata — see serve/scheduler.py)."""
        steps = 0
        inflight = None
        while steps < max_steps:
            self._admit()
            self._ensure_runway()
            self._flush_maintenance()
            new_inflight = None
            if self.num_active:
                if self._n_prefilling():
                    self.interleaved_chunks += 1
                meta = self._dispatch_chunk()
                steps += 1
                try:
                    meta.copy_to_host_async()
                except Exception:  # backend without async copies
                    pass
                new_inflight = (meta, tuple(self._row_gen))
            if inflight is not None:
                m = self._meta_np(inflight[0])
                b = self.batch_rows
                self._harvest(m[b:].astype(bool), m[:b], inflight[1])
                self._epoch_tick()
            inflight = new_inflight
            if inflight is None and not self._pending and not self.num_active:
                self._epoch_reset()
                break
        return steps

    def result(self, rid: int) -> Optional[Completion]:
        return self.completions.pop(rid, None)

    def partial_result(self, rid: int) -> Optional[np.ndarray]:
        """Tokens committed so far (prompt + new, not yet EOS-truncated)
        for a still-decoding request; None when rid is not on a row.
        Powers server-side streaming (serve/server.py SSE): one small
        row fetch per poll, safe to interleave with chunks because the
        host only ever reads — commit state advances monotonically."""
        for row, req in enumerate(self._row_req):
            if req is not None and req.rid == rid:
                from ..parallel.distributed import host_fetch

                toks, cl = host_fetch(
                    (self.state.tokens[row], self.state.cur_len[row]))
                return np.asarray(toks)[: int(cl)]
        return None
