"""Continuous-batching scheduler (M7) — the TPU answer to serving.py's
blocking batch-1 loop (/root/reference/serving.py:15-61, SURVEY.md §3.3).

The reference serves one request at a time through a Flask handler; the
TPU build decodes a *static batch of slots* in SPMD lockstep:

  * The single-request speculative step (``engine.speculative._spec_step``
    — draft gamma, one verify forward, vectorized accept/resample, O(1)
    rollback) is ``jax.vmap``-ed over a slot axis. Per-slot scalars
    (``cur_len``, cache ``length``) become per-slot lanes; the model
    forwards inside run batched over slots, so the target verify is one
    [slots*(gamma+1)]-token MXU-friendly forward instead of ``slots``
    sequential ones.
  * Requests are admitted into free slots by a host scheduler; admission
    runs a jitted per-slot prefill that scatters the prompt's KV into the
    batched cache at the slot index. Prompt lengths are bucketed (64s) so
    the prefill program cache stays small.
  * Finished slots (EOS or token budget) stop advancing via a gate inside
    the vmapped step; their lanes keep computing garbage until replaced —
    the standard SPMD continuous-batching trade (cf. Orca/JetStream-style
    slot scheduling; all-new design, nothing like this exists upstream).

Because rollback is a pointer move (cache/kvcache.py), slot lanes never
reallocate or copy KV — a slot's entire lifetime touches only its own
rows of the static [L, S, H, T, D] cache.
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

from ..cache.kvcache import _map_kv
from ..engine.speculative import SpecState, _spec_step
from ..engine.types import ModelBundle, first_eos_truncate, pad_prompt
from ..ops.sampling import SamplingConfig
from ..parallel.distributed import host_fetch


class BatchState(NamedTuple):
    spec: SpecState      # every leaf carries a leading slot axis (vmap axis 0)
    active: jax.Array    # [S] bool — slot holds a live request
    target_len: jax.Array  # [S] int32 — stop decoding at this cur_len


def _stack_slots(tree, num_slots: int):
    """Allocate a slot-stacked version of a per-slot pytree: every leaf
    gains a leading [S] axis (zeros)."""
    return jax.tree.map(
        lambda x: jnp.zeros((num_slots,) + jnp.shape(x), jnp.asarray(x).dtype), tree
    )


def _take_slot(cache_b, slot):
    """Per-slot cache (lane ``slot``), with length reset for prefill."""
    sliced = jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, slot, 0, keepdims=False), cache_b
    )
    return _map_kv(sliced, lambda x: x, length=0)


def _put_slot(cache_b, cache_s, slot):
    """Scatter a per-slot cache back into lane ``slot``. The length lane's
    value is scratch: every decode step re-derives cache length from
    ``cur_len`` via rollback."""
    return jax.tree.map(
        lambda big, small: jax.lax.dynamic_update_index_in_dim(
            big, small.astype(big.dtype), slot, 0
        ),
        cache_b, cache_s,
    )


@partial(
    jax.jit,
    static_argnames=("bundle_d", "bundle_t", "gamma", "scfg", "eos_token_id", "n_steps"),
    donate_argnames=("state",),
)
def _batched_spec_step(
    params_d, params_t, state: BatchState, *,
    bundle_d: ModelBundle, bundle_t: ModelBundle,
    gamma: int, scfg: SamplingConfig, eos_token_id: int, n_steps: int = 1,
):
    """``n_steps`` speculative decode steps for every slot, in one XLA
    program. Chunking matters: every dispatch to the (possibly remote)
    device costs a host round trip, so the host syncs scheduler metadata
    once per chunk, not once per step. Lanes that finish mid-chunk freeze
    via the ``keep`` gate and only waste their own compute."""

    def one(spec: SpecState, active, target_len):
        s2 = _spec_step(
            bundle_d, bundle_t, params_d, params_t, scfg, gamma,
            eos_token_id, spec, None,
        )
        keep = jnp.logical_and(active, jnp.logical_not(spec.done))

        def sel(new, old):
            return jnp.where(keep, new, old)

        return SpecState(
            tokens=jnp.where(keep, s2.tokens, spec.tokens),
            cur_len=sel(s2.cur_len, spec.cur_len),
            draft_cache=s2.draft_cache,
            target_cache=s2.target_cache,
            key=s2.key,
            done=sel(jnp.logical_or(s2.done, s2.cur_len >= target_len), spec.done),
            accepted=sel(s2.accepted, spec.accepted),
            resamples=sel(s2.resamples, spec.resamples),
            bonus=sel(s2.bonus, spec.bonus),
            steps=sel(s2.steps, spec.steps),
            acc_rate_sum=sel(s2.acc_rate_sum, spec.acc_rate_sum),
            acc_len_hist=jnp.where(keep, s2.acc_len_hist, spec.acc_len_hist),
        )

    def cond(carry):
        i, spec = carry
        live = jnp.any(state.active & jnp.logical_not(spec.done))
        return jnp.logical_and(i < n_steps, live)

    def chunk_step(carry):
        i, spec = carry
        return i + 1, jax.vmap(one)(spec, state.active, state.target_len)

    # while_loop, not fori: once every active lane is done the remaining
    # chunk steps are skipped ON DEVICE (a fixed-depth loop burns full
    # batched forwards on finished slots — see serve/paged.py
    # _paged_chunk_body for the measured overshoot cost)
    _, spec = jax.lax.while_loop(
        cond, chunk_step, (jnp.zeros((), jnp.int32), state.spec))
    return BatchState(spec, state.active, state.target_len), _pack_slot_meta(spec)


def _pack_slot_meta(spec: SpecState) -> jax.Array:
    """Pack scheduling metadata AND the full harvest payload into one
    flat int32 vector (f32 bitcast), per-slot blocks in field order.
    Fresh buffer via concatenate — cannot alias the donated state, so
    the pipelined async host copy survives the next dispatch. Shipping
    the harvest data here makes ``_harvest`` zero-fetch: fetching
    ``self.state`` at harvest time blocks on the IN-FLIGHT chunk's
    pending output whenever slot completions stagger across chunks
    (measured ~850 ms stalls per harvest on the paged engine — see
    serve/paged.py::_pack_chunk_meta for the full story).
    Layout: [cur_len S | done S | steps S | accepted S | resamples S |
    bonus S | acc_rate_sum(bitcast) S | acc_len_hist S*h | tokens S*t]"""
    f = lambda x: x.astype(jnp.int32).reshape(-1)
    return jnp.concatenate([
        f(spec.cur_len), f(spec.done), f(spec.steps), f(spec.accepted),
        f(spec.resamples), f(spec.bonus),
        jax.lax.bitcast_convert_type(
            spec.acc_rate_sum.astype(jnp.float32), jnp.int32).reshape(-1),
        f(spec.acc_len_hist), f(spec.tokens),
    ])


def _unpack_slot_meta(pack: np.ndarray, s: int, h: int, t: int) -> dict:
    o = 0

    def take(n, shape=None):
        nonlocal o
        out = pack[o : o + n]
        o += n
        return out.reshape(shape) if shape else out

    return {
        "cur_len": take(s), "done": take(s).astype(bool), "steps": take(s),
        "accepted": take(s), "resamples": take(s), "bonus": take(s),
        "acc_rate_sum": take(s).view(np.float32),
        "acc_len_hist": take(s * h, (s, h)), "tokens": take(s * t, (s, t)),
    }


@partial(jax.jit, static_argnames=("bundle_d", "bundle_t"), donate_argnames=("state",))
def _prefill_slot(
    params_d, params_t, state: BatchState, slot, prompt_padded, p_len,
    max_new, key, *, bundle_d: ModelBundle, bundle_t: ModelBundle,
) -> BatchState:
    """Admit one request: prefill draft+target KV for ``prompt_padded``
    [1, P_bucket] into slot ``slot`` and reset the slot's lanes."""
    spec = state.spec
    slot = jnp.asarray(slot, jnp.int32)
    p_len = jnp.asarray(p_len, jnp.int32)

    d_slot = _take_slot(spec.draft_cache, slot)
    t_slot = _take_slot(spec.target_cache, slot)
    _, d_slot = bundle_d.forward(params_d, bundle_d.cfg, prompt_padded, d_slot)
    _, t_slot = bundle_t.forward(params_t, bundle_t.cfg, prompt_padded, t_slot)

    t_max = spec.tokens.shape[-1]
    row = jnp.zeros((1, t_max), jnp.int32)
    row = jax.lax.dynamic_update_slice(row, prompt_padded, (0, 0))
    zero32 = jnp.zeros((), jnp.int32)

    new_spec = SpecState(
        tokens=jax.lax.dynamic_update_slice(spec.tokens, row[None], (slot, 0, 0)),
        cur_len=spec.cur_len.at[slot].set(p_len),
        draft_cache=_put_slot(spec.draft_cache, d_slot, slot),
        target_cache=_put_slot(spec.target_cache, t_slot, slot),
        key=spec.key.at[slot].set(key),
        done=spec.done.at[slot].set(False),
        accepted=spec.accepted.at[slot].set(zero32),
        resamples=spec.resamples.at[slot].set(zero32),
        bonus=spec.bonus.at[slot].set(zero32),
        steps=spec.steps.at[slot].set(zero32),
        acc_rate_sum=spec.acc_rate_sum.at[slot].set(0.0),
        acc_len_hist=spec.acc_len_hist.at[slot].set(
            jnp.zeros((spec.acc_len_hist.shape[-1],), jnp.int32)
        ),
    )
    return BatchState(
        spec=new_spec,
        active=state.active.at[slot].set(True),
        target_len=state.target_len.at[slot].set(p_len + jnp.asarray(max_new, jnp.int32)),
    )


@partial(
    jax.jit, static_argnames=("bundle_d", "bundle_t"), donate_argnames=("state",)
)
def _prefill_batch(
    params_d, params_t, state: BatchState, slots, prompts, p_lens,
    max_news, keys, *, bundle_d: ModelBundle, bundle_t: ModelBundle,
) -> BatchState:
    """Admit up to K requests in ONE dispatch: a vmapped prefill reads the
    target's weights once for all K prompts instead of once per request —
    at 13B scale a single admission costs a full 13 GB weight sweep, so
    burst admissions were ~K× more expensive than they needed to be.

    ``slots`` [K] int32; padding rows carry slot index == num_slots, which
    every scatter drops via out-of-bounds ``mode="drop"`` semantics.
    ``prompts`` [K, P_bucket]; ``p_lens``/``max_news`` [K]; ``keys`` [K].
    """
    spec = state.spec
    kb = slots.shape[0]

    # fresh zero caches, NOT a gather of the slots' current rows: the
    # gather materializes K full cache copies (gigabytes at 13B scale)
    # only for every value to be overwritten by the prefill anyway
    d_rows = jax.tree.map(
        lambda x: jnp.zeros((kb,) + x.shape[1:], x.dtype), spec.draft_cache
    )
    t_rows = jax.tree.map(
        lambda x: jnp.zeros((kb,) + x.shape[1:], x.dtype), spec.target_cache
    )

    def one(prompt, d_slot, t_slot):
        d_slot = _map_kv(d_slot, lambda x: x, length=0)
        t_slot = _map_kv(t_slot, lambda x: x, length=0)
        _, d2 = bundle_d.forward(params_d, bundle_d.cfg, prompt[None], d_slot)
        _, t2 = bundle_t.forward(params_t, bundle_t.cfg, prompt[None], t_slot)
        return d2, t2

    d_new, t_new = jax.vmap(one)(prompts, d_rows, t_rows)

    def scat(big, rows):
        return big.at[slots].set(rows.astype(big.dtype), mode="drop")

    t_max = spec.tokens.shape[-1]
    tok_rows = jnp.zeros((slots.shape[0], 1, t_max), jnp.int32)
    tok_rows = jax.lax.dynamic_update_slice(tok_rows, prompts[:, None, :], (0, 0, 0))
    zeros_k = jnp.zeros((slots.shape[0],), jnp.int32)

    new_spec = SpecState(
        tokens=scat(spec.tokens, tok_rows),
        cur_len=scat(spec.cur_len, p_lens),
        draft_cache=jax.tree.map(scat, spec.draft_cache, d_new),
        target_cache=jax.tree.map(scat, spec.target_cache, t_new),
        key=spec.key.at[slots].set(keys, mode="drop"),  # typed PRNG keys: no astype
        done=scat(spec.done, jnp.zeros((slots.shape[0],), bool)),
        accepted=scat(spec.accepted, zeros_k),
        resamples=scat(spec.resamples, zeros_k),
        bonus=scat(spec.bonus, zeros_k),
        steps=scat(spec.steps, zeros_k),
        acc_rate_sum=scat(spec.acc_rate_sum, jnp.zeros((slots.shape[0],), jnp.float32)),
        acc_len_hist=scat(
            spec.acc_len_hist,
            jnp.zeros((slots.shape[0], spec.acc_len_hist.shape[-1]), jnp.int32),
        ),
    )
    return BatchState(
        spec=new_spec,
        active=scat(state.active, jnp.ones((slots.shape[0],), bool)),
        target_len=scat(state.target_len, p_lens + max_news),
    )


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray       # [P] int32
    max_new_tokens: int
    submit_time: float
    prefill_time: Optional[float] = None
    cached_len: int = 0      # prompt positions served from the prefix cache
    # preemption-resume fields (paged engine on-demand mode): a preempted
    # request requeues with prompt = its committed tokens, the row's
    # EVOLVED PRNG key (so the continuation replays bit-identically to
    # the unpreempted run), and the pre-preemption detail counters
    resume_key: Optional[np.ndarray] = None   # [2] uint32 key data
    carry: Optional[dict] = None              # accumulated details
    orig_prompt_len: Optional[int] = None     # user-visible prompt length


@dataclasses.dataclass
class Completion:
    rid: int
    output_ids: np.ndarray   # prompt + generation, EOS-truncated
    prompt_len: int
    details: dict


class ContinuousBatchingEngine:
    """Slot-based continuous batching over one draft/target pair.

    Host-side scheduler: ``submit`` enqueues; ``step`` admits into free
    slots (per-request prefill) and advances every live slot by one
    speculative step; ``run_until_idle`` drains the queue. All device work
    is two jitted programs (prefill per prompt-bucket, one shared decode
    step), so steady-state serving never recompiles.
    """

    def __init__(
        self,
        bundle_d: ModelBundle, params_d,
        bundle_t: ModelBundle, params_t,
        *,
        num_slots: int = 4,
        max_total_len: int = 1024,
        max_new_cap: int = 256,
        gamma: int = 4,
        eos_token_id: int = 2,
        temperature: float = 1.0,
        top_k: int = 20,
        top_p: float = 0.9,
        seed: int = 0,
        prompt_bucket: int = 64,
        steps_per_sync: int = 4,
        mesh=None,
    ):
        # The batched step vmaps the model forward over slots; the
        # flash-decode pallas_call collapses that axis into its native
        # batch grid via a custom_vmap rule (kernels/flash_decode.py
        # _get_flash_fn), so the length-aware kernel serves the batched
        # verify directly — dead cache beyond each slot's live length is
        # never fetched. cfg.flash ("auto"/"on"/"off") is honored as-is.
        self.bundle_d, self.params_d = bundle_d, params_d
        self.bundle_t, self.params_t = bundle_t, params_t
        self.num_slots = num_slots
        self.max_total_len = max_total_len
        self.gamma = gamma
        self.eos_token_id = eos_token_id
        self.scfg = SamplingConfig(temperature, top_k, top_p)
        self.prompt_bucket = prompt_bucket
        # decode steps per host sync: each sync is a device round trip
        # (expensive over remote tunnels); finished lanes freeze mid-chunk
        self.steps_per_sync = max(1, int(steps_per_sync))

        s = num_slots
        key = jax.random.key(seed)
        self._admit_key, step_keys = jax.random.split(key)
        spec = SpecState(
            tokens=jnp.zeros((s, 1, max_total_len), jnp.int32),
            cur_len=jnp.full((s,), 2, jnp.int32),  # >=2 keeps idle lanes safe
            draft_cache=_stack_slots(bundle_d.make_cache(1, max_total_len), s),
            target_cache=_stack_slots(bundle_t.make_cache(1, max_total_len), s),
            key=jax.random.split(step_keys, s),
            done=jnp.ones((s,), bool),
            accepted=jnp.zeros((s,), jnp.int32),
            resamples=jnp.zeros((s,), jnp.int32),
            bonus=jnp.zeros((s,), jnp.int32),
            steps=jnp.zeros((s,), jnp.int32),
            acc_rate_sum=jnp.zeros((s,), jnp.float32),
            acc_len_hist=jnp.zeros((s, max_new_cap), jnp.int32),
        )
        self.state = BatchState(
            spec=spec,
            active=jnp.zeros((s,), bool),
            target_len=jnp.full((s,), max_total_len, jnp.int32),
        )

        # --- multi-chip serving (VERDICT r1 #3): slot axis over dp, model
        # weights megatron-sharded over tp, cache kv-heads over tp. GSPMD
        # propagates the shardings through the batched step; all
        # collectives are compiler-inserted over the mesh (SURVEY §2.6).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import (
                param_specs, shard_params, shard_serving_state,
            )

            self.params_d = shard_params(
                params_d, param_specs(bundle_d.family, bundle_d.cfg), mesh)
            self.params_t = shard_params(
                params_t, param_specs(bundle_t.family, bundle_t.cfg), mesh)
            self.state = shard_serving_state(self.state, mesh)

        self._next_rid = 0
        self._pending: collections.deque[Request] = collections.deque()
        self._slot_req: list[Optional[Request]] = [None] * s
        # occupancy generation per slot: stale pipelined metadata from a
        # previous occupant must never harvest the current one
        self._slot_gen: list[int] = [0] * s
        self.completions: dict[int, Completion] = {}
        self.max_new_cap = max_new_cap

    # ------------------------------------------------------------ interface
    def warmup(self, prompt_len: int = 8) -> None:
        """Pre-compile every steady-state program: the prefill bucket for
        ``prompt_len``, per-slot admission, and the decode chunk. On
        backends with remote compilation each distinct program costs
        seconds the first time — never pay that on a live request."""
        rng = np.random.default_rng(0)
        rid0 = self._next_rid
        rids = []
        # burst of num_slots+1 compiles the full-batch prefill and the K=1
        # path; the extra small waves compile the intermediate power-of-two
        # prefill buckets a steady-state trickle of admissions will hit
        waves = [self.num_slots + 1]
        for kb in (2, 4, 8):
            if 1 < kb < self.num_slots:
                waves.append(kb)
        for n in waves:
            rids += [
                self.submit(rng.integers(2, 100, size=max(prompt_len, 2)), 2)
                for _ in range(n)
            ]
            self.run_until_idle()
        for r in rids:
            self.completions.pop(r, None)
        # keep live traffic's rid sequence (and so its fold_in PRNG
        # stream) independent of how many warmup requests ran — see
        # serve/paged.py warmup for the measured wave-sync rationale
        self._next_rid = rid0

    def submit(self, prompt_ids, max_new_tokens: int = 40) -> int:
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if ids.shape[0] < 2:
            raise ValueError("prompt must have at least 2 tokens")
        max_new = min(int(max_new_tokens), self.max_new_cap)
        if ids.shape[0] + max_new + self.gamma + 1 > self.max_total_len:
            raise ValueError(
                f"prompt({ids.shape[0]}) + max_new({max_new}) exceeds "
                f"max_total_len={self.max_total_len}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._pending.append(Request(rid, ids, max_new, time.perf_counter()))
        return rid

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self._slot_req)

    def _admit(self):
        """Admit pending requests into free slots. Same-bucket prompts are
        prefilled in one batched dispatch (weights read once for the whole
        burst, _prefill_batch); K is rounded up to a power of two with
        OOB-dropped padding rows so the program cache stays log-sized."""
        free = [i for i, r in enumerate(self._slot_req) if r is None]
        while free and self._pending:
            # take a run of pending requests sharing one prompt bucket,
            # capped at 8 per dispatch: prefill activations plus the K new
            # cache rows are transient HBM that must coexist with the
            # weights (at 13B, K=16 is ~2 GB over budget)
            batch: list[tuple[int, Request, np.ndarray, int]] = []
            bucket = None
            while free and self._pending and len(batch) < 8:
                nxt = self._pending[0]
                padded, p_len = pad_prompt(nxt.prompt, self.prompt_bucket)
                if bucket is None:
                    bucket = padded.shape[-1]
                elif padded.shape[-1] != bucket:
                    break
                self._pending.popleft()
                batch.append((free.pop(0), nxt, np.asarray(padded).reshape(-1), p_len))
            k = len(batch)
            if k == 1:
                slot, req, padded, p_len = batch[0]
                # per-request key by rid: identical stream whether the
                # request arrives in a burst or a trickle
                sub = jax.random.fold_in(self._admit_key, req.rid)
                self.state = _prefill_slot(
                    self.params_d, self.params_t, self.state,
                    slot, jnp.asarray(padded[None]), p_len,
                    req.max_new_tokens, sub,
                    bundle_d=self.bundle_d, bundle_t=self.bundle_t,
                )
            else:
                kb = 1 << (k - 1).bit_length()  # next power of two
                pad_rows = kb - k
                slots = np.full((kb,), self.num_slots, np.int32)  # OOB => dropped
                prompts = np.zeros((kb, bucket), np.int32)
                p_lens = np.full((kb,), 2, np.int32)
                max_news = np.zeros((kb,), np.int32)
                for j, (slot, req, padded, p_len) in enumerate(batch):
                    slots[j] = slot
                    prompts[j] = padded
                    p_lens[j] = p_len
                    max_news[j] = req.max_new_tokens
                subs = jnp.stack([
                    jax.random.fold_in(self._admit_key, batch[j][1].rid)
                    if j < k else jax.random.fold_in(self._admit_key, 2**31 - 1)
                    for j in range(kb)
                ])
                self.state = _prefill_batch(
                    self.params_d, self.params_t, self.state,
                    jnp.asarray(slots), jnp.asarray(prompts),
                    jnp.asarray(p_lens), jnp.asarray(max_news), subs,
                    bundle_d=self.bundle_d, bundle_t=self.bundle_t,
                )
            now = time.perf_counter()
            for slot, req, _, _ in batch:
                req.prefill_time = now
                self._slot_req[slot] = req
                self._slot_gen[slot] += 1

    def _collect(self, meta):
        # one transfer for the packed metadata+harvest vector, not one
        # per field — and never state.spec, whose buffers the next
        # dispatch donates away (and whose fetch would block on the
        # in-flight chunk).
        m = _unpack_slot_meta(
            np.asarray(host_fetch(meta)), self.num_slots, self.max_new_cap,
            self.max_total_len)
        self._last_harvest = m
        self._harvest(m["done"], m["cur_len"], tuple(self._slot_gen))

    def _harvest(self, done: np.ndarray, cur_len: np.ndarray, gens: tuple):
        """Harvest finished slots given (possibly one-chunk-stale) metadata.
        Staleness is safe for a still-occupied slot — a done lane is frozen
        by the decode-step keep gate, so its result lanes read the same at
        any later chunk — but metadata recorded under a previous occupancy
        generation must not harvest the slot's new request."""
        spec = self.state.spec
        fin = [s for s, r in enumerate(self._slot_req)
               if r is not None and done[s] and gens[s] == self._slot_gen[s]]
        if not fin:
            return
        # zero-fetch: all result lanes ride the chunk's own packed
        # metadata (see _pack_slot_meta)
        hv = self._last_harvest
        toks_f, steps_f, hist_f, accr_f, acc_f, res_f, bon_f = (
            hv["tokens"], hv["steps"], hv["acc_len_hist"],
            hv["acc_rate_sum"], hv["accepted"], hv["resamples"], hv["bonus"],
        )
        for slot in fin:
            i = slot
            req = self._slot_req[slot]
            p_len = req.prompt.shape[0]
            out = first_eos_truncate(toks_f[i], p_len, int(cur_len[slot]), self.eos_token_id)
            steps = int(steps_f[i])
            drafted = steps * self.gamma
            now = time.perf_counter()
            details = {
                "ttft_s": (req.prefill_time or now) - req.submit_time,
                "latency_s": now - req.submit_time,
                "acc_len": np.asarray(hist_f[i])[:steps].tolist(),
                "acc_rate": float(accr_f[i]) / max(drafted, 1),
                "target_call_times": steps,
                "approx_call_times": steps,
                "accepted_count": int(acc_f[i]),
                "resample_count": int(res_f[i]),
                "target_sample_count": int(bon_f[i]),
                "tokens_generated": len(out) - p_len,
            }
            self.completions[req.rid] = Completion(req.rid, out, p_len, details)
            self._slot_req[slot] = None
            self.state = BatchState(
                spec=spec,
                # dynamic index -> one compiled scatter for every slot value
                active=self.state.active.at[jnp.asarray(slot)].set(False),
                target_len=self.state.target_len,
            )
            spec = self.state.spec

    def step(self) -> int:
        """Admit + one decode chunk (``steps_per_sync`` batched steps in a
        single dispatch) + harvest. Returns #live slots."""
        self._admit()
        if self.num_active:
            self.state, meta = _batched_spec_step(
                self.params_d, self.params_t, self.state,
                bundle_d=self.bundle_d, bundle_t=self.bundle_t,
                gamma=self.gamma, scfg=self.scfg, eos_token_id=self.eos_token_id,
                n_steps=self.steps_per_sync,
            )
            self._collect(meta)
        return self.num_active

    def run_until_idle(self, max_steps: int = 10_000):
        """Drain the queue with a one-chunk-deep pipeline: dispatch chunk
        k+1 BEFORE reading chunk k's metadata (whose host copy was started
        asynchronously), so the device never waits on the host round trip.
        Harvesting done lanes one chunk late is safe (see _harvest)."""
        steps = 0
        inflight = None  # (done, cur_len) device arrays with async host copy
        while steps < max_steps:
            self._admit()
            dispatched = False
            if self.num_active:
                self.state, meta = _batched_spec_step(
                    self.params_d, self.params_t, self.state,
                    bundle_d=self.bundle_d, bundle_t=self.bundle_t,
                    gamma=self.gamma, scfg=self.scfg,
                    eos_token_id=self.eos_token_id,
                    n_steps=self.steps_per_sync,
                )
                steps += 1
                dispatched = True
                try:
                    meta.copy_to_host_async()
                except Exception:  # backend without async copies
                    pass
                new_inflight = (meta, tuple(self._slot_gen))
            else:
                new_inflight = None
            if inflight is not None:
                m = _unpack_slot_meta(
                    np.asarray(host_fetch(inflight[0])), self.num_slots,
                    self.max_new_cap, self.max_total_len)
                self._last_harvest = m
                self._harvest(m["done"], m["cur_len"], inflight[1])
            inflight = new_inflight
            if not dispatched and inflight is None and not self._pending \
                    and not self.num_active:
                break
        return steps

    def result(self, rid: int) -> Optional[Completion]:
        return self.completions.pop(rid, None)

    def partial_result(self, rid: int) -> Optional[np.ndarray]:
        """Tokens committed so far (prompt + new, not yet EOS-truncated)
        for a still-decoding request; None when rid is not on a slot.
        Powers server-side streaming (serve/server.py SSE) — a read-only
        lane fetch, monotone across chunks."""
        for slot, req in enumerate(self._slot_req):
            if req is not None and req.rid == rid:
                spec = self.state.spec
                toks, cl = host_fetch(
                    (spec.tokens[slot, 0], spec.cur_len[slot]))
                return np.asarray(toks)[: int(cl)]
        return None
