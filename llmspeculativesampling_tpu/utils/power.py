"""Power/energy observability sidecar (L5).

Parity with the reference's ``gpu_power_monitor.py:5-17`` (1 Hz nvidia-smi
poller integrated into J/token, evaluation.py:134-152). TPU host images
expose no standard userspace power counter, so this module provides the
same API against whichever source is available:

  * ``tpu-runtime`` metrics endpoint if present (not in this image),
  * ``/sys/class/powercap`` RAPL counters (host CPU power) as a proxy,
  * otherwise a null sampler (samples empty, energy 0) so harness code
    paths stay identical.
"""

from __future__ import annotations

import glob
import threading
import time
from typing import List, Tuple


class PowerMonitor:
    """Background sampler: collect (timestamp, watts) at ``interval`` s."""

    def __init__(self, interval: float = 1.0):
        self.interval = interval
        self.samples: List[Tuple[float, float]] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._rapl = sorted(glob.glob("/sys/class/powercap/intel-rapl:*/energy_uj"))
        self._last_energy = None

    def _read_watts(self) -> float | None:
        if not self._rapl:
            return None
        try:
            total = sum(int(open(p).read()) for p in self._rapl)
        except OSError:
            return None
        now = time.time()
        if self._last_energy is None:
            self._last_energy = (total, now)
            return None
        de = total - self._last_energy[0]
        dt = now - self._last_energy[1]
        self._last_energy = (total, now)
        if dt <= 0 or de < 0:  # counter wrap
            return None
        return de / 1e6 / dt

    def _run(self):
        while not self._stop.is_set():
            w = self._read_watts()
            if w is not None:
                self.samples.append((time.time(), w))
            self._stop.wait(self.interval)

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def total_energy(self, t1: float, t2: float) -> float:
        """Integrate watts over (t1, t2) like the reference's
        get_total_power (evaluation.py:134-152): sum of 1 Hz samples
        strictly inside the window, skipping the first."""
        inside = [w for ts, w in self.samples if t1 < ts < t2]
        return float(sum(inside[1:])) * self.interval if len(inside) > 1 else 0.0
