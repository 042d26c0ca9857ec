"""Tracing / profiling sidecar (SURVEY.md §5 tracing row).

The reference wraps method calls in ``torch.profiler`` with a tensorboard
trace handler and prints wall-clock tokens/s
(/root/reference/evaluate_chat.py:43-66), plus per-phase
``process_time_ns`` timers surfaced in the ``details`` dicts
(speculative_sampling.py:1937-1962) and per-stage timers inside the cache
(kvcache_model.py:33-36).

TPU equivalents here:
  * :func:`trace` — context manager around ``jax.profiler`` emitting an
    xprof/tensorboard trace directory (the torch.profiler parity).
  * :func:`benchmark` — the ``benchmark()`` wrapper: repeat a generate
    call, report wall tokens/s, optionally tracing one repeat.
  * :class:`PhaseTimer` — host-side phase accounting for stepwise drivers
    (the engines' fused programs report phase splits via their ``details``
    dicts instead; see engine/speculative.py docstring).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Emit a jax.profiler trace viewable in tensorboard/xprof
    (torch.profiler + tensorboard_trace_handler parity,
    evaluate_chat.py:46-53)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable[[], object],
    *,
    repeats: int = 10,
    warmup: int = 1,
    tokens_per_call: Optional[int] = None,
    trace_dir: Optional[str] = None,
) -> Dict:
    """Repeat ``fn`` and report wall-clock stats (the reference's
    ``benchmark()`` TEST_TIME=10 loop, evaluate_chat.py:43-66).

    ``fn`` must synchronize internally (the engines do: they fetch the
    generated tokens). If ``trace_dir`` is given, the first timed repeat
    runs under a profiler trace.
    """
    for _ in range(warmup):
        fn()
    times = []
    for i in range(repeats):
        if i == 0 and trace_dir:
            with trace(trace_dir):
                t0 = time.perf_counter()
                fn()
                times.append(time.perf_counter() - t0)
        else:
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
    mean = sum(times) / len(times)
    out = {
        "repeats": repeats,
        "mean_s": mean,
        "best_s": min(times),
        "worst_s": max(times),
    }
    if tokens_per_call:
        out["tokens_per_s"] = tokens_per_call / mean
        out["best_tokens_per_s"] = tokens_per_call / min(times)
    return out


class PhaseTimer:
    """Accumulate named phase wall times (the reference's
    ``forward_time_dict`` shape, kvcache_model.py:33-36)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)
