"""Multi-host SPMD serving driver (SURVEY.md §7.3 "multi-host serving").

Under ``jax.distributed`` every process must execute the same jitted
programs in the same order (SPMD) — but requests arrive at one host. This
driver keeps the ``ContinuousBatchingEngine`` in lockstep across hosts:

  * host 0 owns the request queue and decides each round's *plan*: which
    requests enter which slots (fixed-size, padded arrays so the broadcast
    shape is static), then how many decode chunks to run;
  * the plan is replicated with ``multihost_utils.broadcast_one_to_all``
    (a psum over DCN under the hood), after which every process issues the
    identical `_prefill_slot` / `_batched_spec_step` sequence;
  * results are identical on all hosts (same programs, same replicated
    state); host 0 is the one that answers clients.

Single-process runs broadcast trivially, so the whole path is exercised by
the CPU test suite; a real pod slice only changes where the params/caches
live (shard them with ``parallel.sharding`` before building the engine).

The reference has no distributed serving at all (blocking batch-1 Flask,
/root/reference/serving.py:15-61).
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np
import jax

from ..engine.types import pad_prompt
from .scheduler import ContinuousBatchingEngine, Request


class WorkerLostError(RuntimeError):
    """A peer process stopped participating in the lockstep collectives
    (died, wedged, or unreachable). The raising driver preserves all host
    state; call :meth:`PagedMultiHostDriver.recover_requests` to extract
    every outstanding request in resumable form (SURVEY.md §5
    "health-checked multi-host serving loop" — the reference has no
    distributed serving, let alone failure handling)."""


def _broadcast(tree, timeout_s: Optional[float] = None):
    """Lockstep broadcast with an optional watchdog: a collective that
    neither completes nor errors within ``timeout_s`` means a peer is
    gone (dead workers either reset the gloo/DCN connection — immediate
    error — or leave the collective hanging). Collective failures are
    classified as :class:`WorkerLostError`; the abandoned worker thread
    is daemonic and never unblocks, which is acceptable on the failure
    path (the process is about to tear down or re-form its mesh)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return tree
    if timeout_s is None:
        return multihost_utils.broadcast_one_to_all(tree)
    box: list = []
    err: list = []

    def work():
        try:
            box.append(multihost_utils.broadcast_one_to_all(tree))
        except Exception as e:  # noqa: BLE001 — classified below
            err.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise WorkerLostError(
            f"lockstep broadcast did not complete within {timeout_s}s — "
            f"a peer process is gone or wedged")
    if err:
        raise WorkerLostError(
            f"lockstep collective failed: {err[0]!r}") from err[0]
    return box[0]


class MultiHostDriver:
    """Lockstep wrapper around a ``ContinuousBatchingEngine``.

    Only host 0 may call :meth:`submit`. Every host calls :meth:`round`
    at the same cadence (e.g. from the same serving loop).
    """

    def __init__(self, engine: ContinuousBatchingEngine, prompt_cap: int = 512):
        self.engine = engine
        self.prompt_cap = prompt_cap
        self.is_primary = jax.process_index() == 0

    def submit(self, prompt_ids, max_new_tokens: int = 40) -> int:
        assert self.is_primary, "only host 0 owns the request queue"
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if ids.shape[0] > self.prompt_cap:
            raise ValueError(f"prompt longer than prompt_cap={self.prompt_cap}")
        return self.engine.submit(ids, max_new_tokens)

    def _build_plan(self):
        """Host 0: admission plan as fixed-shape arrays.

        Returns (slots [S], p_lens [S], max_new [S], prompts [S, cap]) with
        slot == -1 marking unused entries; mirrors engine._admit's policy.
        """
        eng = self.engine
        s = eng.num_slots
        slots = np.full((s,), -1, np.int32)
        p_lens = np.zeros((s,), np.int32)
        max_new = np.zeros((s,), np.int32)
        prompts = np.zeros((s, self.prompt_cap), np.int32)
        if self.is_primary:
            free = [i for i, r in enumerate(eng._slot_req) if r is None]
            j = 0
            while free and eng._pending:
                slot = free.pop(0)
                req = eng._pending.popleft()
                slots[j] = slot
                p_lens[j] = req.prompt.shape[0]
                max_new[j] = req.max_new_tokens
                prompts[j, : req.prompt.shape[0]] = req.prompt
                self._planned.append((slot, req))
                j += 1
        return slots, p_lens, max_new, prompts

    def round(self, chunks: int = 1) -> int:
        """One lockstep scheduling round: broadcast admissions, prefill
        them identically everywhere, run ``chunks`` decode chunks, harvest
        on host 0. Returns the number of live slots (host-0 view)."""
        import time as _time

        eng = self.engine
        self._planned: list = []
        slots, p_lens, max_new, prompts = _broadcast(self._build_plan())
        for j in range(eng.num_slots):
            slot = int(slots[j])
            if slot < 0:
                continue
            p = np.asarray(prompts[j][: int(p_lens[j])], np.int32)
            padded, p_len = pad_prompt(p, eng.prompt_bucket)
            # split (not fold_in-by-rid as in engine._admit): every host
            # advances _admit_key identically through the same plan, and
            # host 0's rids don't exist on the other hosts
            eng._admit_key, sub = jax.random.split(eng._admit_key)
            from .scheduler import _prefill_slot

            eng.state = _prefill_slot(
                eng.params_d, eng.params_t, eng.state, slot,
                jax.numpy.asarray(padded), p_len, int(max_new[j]), sub,
                bundle_d=eng.bundle_d, bundle_t=eng.bundle_t,
            )
            if self.is_primary:
                # host 0 re-attaches its queue bookkeeping
                _, req = self._planned.pop(0)
                req.prefill_time = _time.perf_counter()
                eng._slot_req[slot] = req
                eng._slot_gen[slot] += 1
            else:
                # non-primary hosts track occupancy with placeholder reqs
                eng._slot_req[slot] = Request(
                    rid=-1, prompt=p, max_new_tokens=int(max_new[j]),
                    submit_time=_time.perf_counter(),
                )
                eng._slot_gen[slot] += 1

        from .scheduler import _batched_spec_step

        n_live = sum(r is not None for r in eng._slot_req)
        if n_live:
            meta = None
            for _ in range(chunks):
                eng.state, meta = _batched_spec_step(
                    eng.params_d, eng.params_t, eng.state,
                    bundle_d=eng.bundle_d, bundle_t=eng.bundle_t,
                    gamma=eng.gamma, scfg=eng.scfg,
                    eos_token_id=eng.eos_token_id,
                    n_steps=eng.steps_per_sync,
                )
            eng._collect(meta)
        return eng.num_active

    def run_until_idle(self, max_rounds: int = 10_000) -> int:
        rounds = 0
        while (self.engine._pending or self.engine.num_active) and rounds < max_rounds:
            self.round()
            rounds += 1
        return rounds

    def result(self, rid: int):
        return self.engine.result(rid)


class PagedMultiHostDriver:
    """Lockstep wrapper around a :class:`~..serve.paged.PagedEngine`.

    Unlike the slotted driver (which broadcasts an explicit slot plan and
    re-issues the prefill calls itself), the paged engine's ENTIRE host
    loop — admission order, per-shard page allocators, prefix-cache
    registries, fold_in(admit_key, rid) PRNG keys, chunk early-exit,
    harvest order — is a deterministic function of the injected request
    stream and the replicated/sharded device state. So lockstep only
    needs the request stream replicated: host 0 owns the external queue,
    each round broadcasts the (rid, prompt, max_new) entries it releases,
    every host injects them via ``submit_with_rid`` and calls the same
    ``engine.step()``; all hosts then evolve identically (proven
    bit-identical across two real processes with the dp x tp sharded
    mesh, tests/test_multihost_lockstep.py). Host 0 answers clients;
    the other hosts simply drop their (identical) completions.
    """

    def __init__(self, engine, prompt_cap: int = 512, batch_cap: int = 8,
                 heartbeat_timeout_s: Optional[float] = None):
        self.engine = engine
        self.prompt_cap = prompt_cap
        self.batch_cap = batch_cap
        # failure detection (SURVEY.md §5): the per-round broadcast IS the
        # heartbeat — a peer that dies either resets the collective
        # (immediate error) or leaves it hanging past this timeout;
        # both classify as WorkerLostError with host state preserved.
        # Coverage caveat: the timeout watchdog wraps only the broadcast;
        # collectives INSIDE eng.step() surface errors (classified below)
        # but on transports where a dead-peer collective hangs rather
        # than errors, detection waits until the next round's broadcast —
        # and a step that hangs forever needs an external supervisor
        # timeout (jax collectives cannot be safely interrupted
        # in-thread). Worst-case detection latency is therefore one
        # round + heartbeat_timeout_s.
        self.heartbeat_timeout_s = heartbeat_timeout_s
        self.failed = False
        self.is_primary = jax.process_index() == 0
        self._queue: list = []  # host-0 external queue: (rid, ids, max_new)
        self._next_rid = 0

    def submit(self, prompt_ids, max_new_tokens: int = 40) -> int:
        assert self.is_primary, "only host 0 owns the request queue"
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if ids.shape[0] > self.prompt_cap:
            raise ValueError(f"prompt longer than prompt_cap={self.prompt_cap}")
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, ids, int(max_new_tokens), time.perf_counter()))
        return rid

    def _build_plan(self):
        """Peek (do not consume — a failed broadcast must not lose the
        planned entries) up to batch_cap queue releases."""
        k = self.batch_cap
        rids = np.full((k,), -1, np.int64)
        p_lens = np.zeros((k,), np.int32)
        max_new = np.zeros((k,), np.int32)
        prompts = np.zeros((k, self.prompt_cap), np.int32)
        n_planned = 0
        if self.is_primary:
            n_planned = min(k, len(self._queue))
            for j in range(n_planned):
                rid, ids, mn, _t0 = self._queue[j]
                rids[j] = rid
                p_lens[j] = ids.shape[0]
                max_new[j] = mn
                prompts[j, : ids.shape[0]] = ids
        # every host must agree on whether host 0 still holds queued work
        # (the local `_queue` is empty off-primary — looping on it alone
        # would desynchronize run_until_idle and deadlock the broadcast)
        more = np.asarray(len(self._queue) > n_planned, np.int32)
        return n_planned, (rids, p_lens, max_new, prompts, more)

    def round(self, chunks: int = 1) -> int:
        """Broadcast up to ``batch_cap`` releases, inject them on every
        host, run ``chunks`` engine steps. Returns live rows (host-0
        view; identical everywhere). Raises :class:`WorkerLostError` when
        a peer stops participating (state preserved — see
        :meth:`recover_requests`)."""
        if self.failed:
            raise WorkerLostError("driver is degraded; recover_requests()")
        eng = self.engine
        n_planned, plan = self._build_plan()
        try:
            rids, p_lens, max_new, prompts, more = _broadcast(
                plan, self.heartbeat_timeout_s)
        except WorkerLostError:
            self.failed = True
            raise
        if self.is_primary:
            del self._queue[:n_planned]  # consumed only after the
            # broadcast succeeded: the releases now exist on every host
        self._more_queued = bool(more)
        for j in range(rids.shape[0]):
            if int(rids[j]) < 0:
                continue
            eng.submit_with_rid(
                int(rids[j]),
                np.asarray(prompts[j][: int(p_lens[j])], np.int32),
                int(max_new[j]),
            )
        for _ in range(max(chunks, 1)):
            try:
                eng.step()
            except Exception as e:  # noqa: BLE001
                # classify only RUNTIME/transport failures as peer loss —
                # host-side scheduling errors (ValueError, the engine's
                # own capacity RuntimeError, ...) must surface as
                # themselves, or a config bug becomes an endless
                # detect-recover loop
                mod = type(e).__module__ or ""
                is_runtime = (mod.startswith(("jax", "jaxlib"))
                              or isinstance(e, OSError))
                if jax.process_count() > 1 and is_runtime:
                    # a collective inside the sharded step failing means a
                    # peer went away mid-chunk; host scheduler state is
                    # still coherent as of the last consumed chunk
                    self.failed = True
                    raise WorkerLostError(
                        f"engine step collective failed: {e!r}") from e
                raise
        return eng.num_active

    def recover_requests(self) -> list:
        """Host 0, after :class:`WorkerLostError`: every outstanding
        request in resumable form — running rows are preempted into
        resume Requests (committed tokens + evolved PRNG key from the
        last harvested chunk metadata; ZERO device access, so this works
        with the mesh gone), plus the engine's pending queue and the
        driver's unreleased queue. Feed them to a fresh engine via
        ``submit_request`` after re-forming a mesh / reloading params
        from checkpoint; requests that had progressed resume instead of
        restarting."""
        assert self.failed, "recover_requests() is the failure path"
        assert self.is_primary, "only host 0 owns request state"
        recovered = self.engine.drain_requests()
        for rid, ids, mn, t0 in self._queue:
            # original submit time rides along so post-recovery TTFT /
            # latency metrics stay honest for the longest waiters
            recovered.append(Request(rid, ids, mn, t0))
        self._queue.clear()
        return recovered

    def run_until_idle(self, max_rounds: int = 10_000) -> int:
        """Drain. Do-while shape: EVERY host must enter the first round
        (a non-primary host sees an empty local queue and idle engine
        before the first broadcast — gating on that would leave host 0's
        broadcast waiting forever); after each round all hosts agree on
        the continue condition (engine state is identical, and the
        still-queued flag rode the broadcast)."""
        rounds = 0
        while rounds < max_rounds:
            self.round()
            rounds += 1
            if not (self._more_queued or self.engine._pending
                    or self.engine.num_active):
                break
        return rounds

    def result(self, rid: int):
        return self.engine.result(rid)
