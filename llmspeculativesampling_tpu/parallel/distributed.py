"""Multi-host runtime (SURVEY.md §2.6 — a from-scratch build item).

The reference has no distributed backend at all: its one ``dist.all_reduce``
is unreachable dead code (/root/reference/sampling/kvcache_model.py:669-677)
and "multi-GPU" means accelerate's sequential layer offload
(/root/reference/evaluation.py:183-253). On TPU the idiomatic stack is:

  * ``jax.distributed.initialize`` — one process per host, all chips of a
    slice become globally addressable; XLA runs every jitted program SPMD.
  * A hybrid mesh: the tensor-parallel axis maps to chips *within* a host
    (ICI, ~100s of GB/s) and the data-parallel axis spans hosts (DCN) —
    so the per-layer psum/all-gather collectives of megatron TP never
    cross the datacenter network.
  * Collectives are inserted by the GSPMD partitioner from the sharding
    annotations in ``parallel.sharding``; nothing here issues them by hand.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from .sharding import DP_AXIS, TP_AXIS


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-host cluster; no-op for single-process runs.

    Reads the standard env vars (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``; on Cloud TPU VMs
    ``jax.distributed.initialize()`` auto-detects from metadata) when the
    explicit arguments are absent. Returns this host's process index.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return 0  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # The package defers persistent-compile-cache auto-detection when
    # multi-host env vars are present (resolving the backend at import
    # would initialize XLA before this call and make it raise); now that
    # the cluster is up it is safe to engage the cache.
    from .. import _configure_compile_cache

    _configure_compile_cache()
    return jax.process_index()


def host_fetch(tree):
    """``jax.device_get`` that also works on cross-process sharded arrays.

    Single process (or fully-addressable leaves): plain ``device_get``.
    Multi-process with dp/tp shards living on other hosts: a collective
    ``process_allgather`` (tiled — returns the assembled GLOBAL value on
    every host). This is a COLLECTIVE: every process must call it at the
    same point, which the lockstep serving design guarantees
    (serve/multihost.py — all hosts execute the same plan in the same
    order)."""
    leaves = jax.tree.leaves(tree)
    if jax.process_count() == 1 or all(
        getattr(x, "is_fully_addressable", True) for x in leaves
    ):
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: (
            multihost_utils.process_allgather(x, tiled=True)
            if not getattr(x, "is_fully_addressable", True)
            else jax.device_get(x)
        ),
        tree,
    )


def global_mesh(dp: int = 1, tp: Optional[int] = None) -> Mesh:
    """Build a ``(dp, tp)`` mesh over all global devices, TP innermost.

    Multi-process: uses ``mesh_utils.create_hybrid_device_mesh`` so the tp
    axis stays within each host's ICI domain and dp spans hosts over DCN.
    Single-process: plain contiguous reshape (devices enumerated in ICI
    order by the runtime).
    """
    n = len(jax.devices())
    if tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp})*tp({tp}) != {n} global devices"
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        per_host = n // jax.process_count()
        assert tp <= per_host and per_host % tp == 0, (
            f"tp={tp} must divide the {per_host} chips of one host so TP "
            "collectives ride ICI, not DCN"
        )
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(max(dp // jax.process_count(), 1), tp),
                dcn_mesh_shape=(min(dp, jax.process_count()), 1),
            )
        except ValueError:
            # virtual CPU backends report one slice for every process, so
            # the hybrid builder can't see the DCN granularity; order by
            # process explicitly — each process's local devices become tp
            # rows, dp spans processes — the same layout the hybrid mesh
            # produces on real slices.
            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            devices = np.asarray(devs).reshape(dp, tp)
        return Mesh(devices, (DP_AXIS, TP_AXIS))
    return Mesh(np.asarray(jax.devices()).reshape(dp, tp), (DP_AXIS, TP_AXIS))
