"""Mesh + sharding rules (the from-scratch distribution layer, SURVEY.md §2.6).

The reference has NO real parallelism (batch=1, accelerate layer-offload
only; dead ``dist.all_reduce``, kvcache_model.py:669-677). This module is
the TPU-native build item: a 2D ``(dp, tp)`` device mesh, megatron-style
tensor-parallel sharding of the decoder weights over ``tp`` (attention
heads + MLP columns + vocab), batch over ``dp``, with XLA inserting the
collectives (GSPMD) — psum on the row-parallel projections rides ICI.

Usage: build a mesh, shard params once with ``shard_params``, and jit the
engine step with these shardings; the KV cache shards its head axis.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LlamaConfig, OPTConfig

DP_AXIS = "dp"
TP_AXIS = "tp"

def global_put(x, sharding: NamedSharding):
    """``device_put`` onto a mesh that may span processes.

    Single-process (or fully-addressable) meshes: plain ``device_put``.
    Cross-process meshes (the dp-over-DCN serving layout): every process
    holds the identical full host value (deterministic construction is a
    lockstep invariant, serve/multihost.py), so each process materializes
    just its addressable shards via ``make_array_from_callback``."""
    if getattr(sharding, "is_fully_addressable", True):
        return jax.device_put(x, sharding)
    import jax.numpy as jnp

    if jnp.issubdtype(getattr(x, "dtype", np.float32), jax.dtypes.prng_key):
        # typed PRNG keys can't round-trip through numpy: place the raw
        # key data (one trailing impl axis, replicated) and re-wrap
        data = np.asarray(jax.random.key_data(x))
        spec = tuple(sharding.spec) + (None,) * (data.ndim - len(sharding.spec))
        inner = NamedSharding(sharding.mesh, P(*spec))
        arr = jax.make_array_from_callback(data.shape, inner, lambda idx: data[idx])
        return jax.random.wrap_key_data(arr)
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])



def make_mesh(dp: int = 1, tp: Optional[int] = None, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if tp is None:
        tp = devices.size // dp
    assert dp * tp == devices.size, f"dp*tp={dp*tp} != {devices.size} devices"
    return Mesh(devices.reshape(dp, tp), (DP_AXIS, TP_AXIS))


def llama_param_specs(cfg: LlamaConfig) -> dict:
    """Megatron TP layout: column-parallel qkv/gate/up, row-parallel o/down,
    vocab-parallel embedding + head. Leading axis of layer weights is the
    scanned layer index (replicated)."""
    col = P(None, None, TP_AXIS)  # [L, in, out] shard out
    row = P(None, TP_AXIS, None)  # [L, in, out] shard in
    layers = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "w_gate": col, "w_up": col, "w_down": row,
        "ln_attn": P(None, None), "ln_mlp": P(None, None),
    }
    if getattr(cfg, "qkv_bias", False):  # Qwen2: biases follow the col split
        layers["bq"] = P(None, TP_AXIS)
        layers["bk"] = P(None, TP_AXIS)
        layers["bv"] = P(None, TP_AXIS)
    return {
        "embed": P(TP_AXIS, None),
        "lm_head": P(TP_AXIS, None),
        "ln_final": P(None),
        "layers": layers,
    }


def opt_param_specs(cfg: OPTConfig) -> dict:
    col = P(None, None, TP_AXIS)
    row = P(None, TP_AXIS, None)
    vec_col = P(None, TP_AXIS)
    rep = P(None, None)
    specs = {
        "embed": P(TP_AXIS, None),
        "embed_pos": P(None, None),
        "layers": {
            "wq": col, "bq": vec_col, "wk": col, "bk": vec_col,
            "wv": col, "bv": vec_col, "wo": row, "bo": rep,
            "ln_attn_w": rep, "ln_attn_b": rep,
            "fc1_w": col, "fc1_b": vec_col, "fc2_w": row, "fc2_b": rep,
            "ln_mlp_w": rep, "ln_mlp_b": rep,
        },
        "ln_final_w": P(None), "ln_final_b": P(None),
    }
    return specs


def param_specs(family: str, cfg) -> dict:
    return llama_param_specs(cfg) if family == "llama" else opt_param_specs(cfg)


def quant_leaf_spec(spec: P) -> dict:
    """Derive the spec for a quantized weight ``{"q": int8 [..., K, N],
    "s": f32 [..., N]}`` from its dense ``[..., K, N]`` spec: ``q`` keeps
    the dense layout; ``s`` drops the K (second-to-last) axis."""
    entries = tuple(spec)
    s_spec = P(*(entries[:-2] + entries[-1:])) if len(entries) >= 2 else spec
    return {"q": spec, "s": s_spec}


def cache_spec() -> P:
    """KV cache data [L, B, H_kv, S_max, D]: heads over tp, batch over dp."""
    return P(None, DP_AXIS, TP_AXIS, None, None)


def cache_scale_spec() -> P:
    """Int8-cache scales [L, B, H_kv, S_max] (no head_dim axis)."""
    return P(None, DP_AXIS, TP_AXIS, None)


def shard_cache(cache, mesh: Mesh):
    """Place a (dense or int8) KV cache on the mesh: batch over dp, kv-heads
    over tp; the scalar ``length`` pointer is replicated."""

    def place(x):
        if x.ndim == 5:
            spec = cache_spec()
        elif x.ndim == 4:
            spec = cache_scale_spec()
        else:
            spec = P()
        return global_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, cache)


def slot_cache_place(x, mesh: Mesh):
    """Placement for one leaf of a SLOT-STACKED cache (leading [S] axis
    from the serving engine's _stack_slots): slots over dp, kv-heads over
    tp, everything else replicated. Covers dense k/v [S,L,1,H,T,D], int8
    scales [S,L,1,H,T], and the per-slot length [S]."""
    if x.ndim == 6:
        spec = P(DP_AXIS, None, None, TP_AXIS, None, None)
    elif x.ndim == 5:
        spec = P(DP_AXIS, None, None, TP_AXIS, None)
    else:
        spec = P(DP_AXIS)
    return global_put(x, NamedSharding(mesh, spec))


def shard_serving_state(state, mesh: Mesh):
    """Place a serving ``BatchState`` on the mesh: the slot axis over dp,
    cache kv-heads over tp (SURVEY.md §2.6 — continuous batching over the
    data axis is the reference-absent capability being built). Requires
    num_slots % dp == 0."""
    spec_state = state.spec
    dp = mesh.shape[DP_AXIS]
    num_slots = spec_state.cur_len.shape[0]
    assert num_slots % dp == 0, (
        f"num_slots={num_slots} must divide over dp={dp}")

    def place_rank(x):
        spec = P(DP_AXIS, *([None] * (x.ndim - 1)))
        return global_put(x, NamedSharding(mesh, spec))

    new_spec = spec_state._replace(
        tokens=place_rank(spec_state.tokens),
        cur_len=place_rank(spec_state.cur_len),
        draft_cache=jax.tree.map(
            lambda x: slot_cache_place(x, mesh), spec_state.draft_cache),
        target_cache=jax.tree.map(
            lambda x: slot_cache_place(x, mesh), spec_state.target_cache),
        key=place_rank(spec_state.key),
        done=place_rank(spec_state.done),
        accepted=place_rank(spec_state.accepted),
        resamples=place_rank(spec_state.resamples),
        bonus=place_rank(spec_state.bonus),
        steps=place_rank(spec_state.steps),
        acc_rate_sum=place_rank(spec_state.acc_rate_sum),
        acc_len_hist=place_rank(spec_state.acc_len_hist),
    )
    return state._replace(
        spec=new_spec,
        active=place_rank(state.active),
        target_len=place_rank(state.target_len),
    )


def shard_paged_state(state, mesh: Mesh):
    """Place a ``PagedBatchState`` on the mesh: batch rows over dp, pool
    BLOCKS over dp and kv-heads over tp (pools
    ``[L, N_blocks, H_kv, page, D]``, int8 scales drop D), block tables
    and per-row lanes following their rows over dp.

    The dp split is real (VERDICT r2 ask #5): rows map statically to dp
    shards (row r -> shard r // (B/dp)), each shard's rows index only its
    own N/dp-block pool half through a PER-SHARD host allocator handing
    out shard-local block ids, and the device entry points run under
    ``shard_map`` (manual dp, auto tp — serve/paged.py::_build_dp_fns),
    so the steady state has zero cross-dp collectives. At dp == 1 every
    dp entry is trivially replication and the layout reduces to the
    tp-only sharding."""

    def place_pool(x):
        if x.ndim == 5:
            spec = P(None, DP_AXIS, TP_AXIS, None, None)
        elif x.ndim == 4:
            spec = P(None, DP_AXIS, TP_AXIS, None)
        elif x.ndim == 2:
            spec = P(DP_AXIS, None)  # block_tables [B, P]
        else:
            spec = P(DP_AXIS)  # lengths [B]
        return global_put(x, NamedSharding(mesh, spec))

    def place_rows(x):
        return global_put(
            x, NamedSharding(mesh, P(DP_AXIS, *([None] * (x.ndim - 1)))))

    return state._replace(
        draft_cache=jax.tree.map(place_pool, state.draft_cache),
        target_cache=jax.tree.map(place_pool, state.target_cache),
        **{f: jax.tree.map(place_rows, getattr(state, f))
           for f in state._fields if f not in ("draft_cache", "target_cache")},
    )


def shard_params(params, specs, mesh: Mesh):
    """Place a param pytree on the mesh with the given PartitionSpecs.

    Quantized leaves (``{"q", "s"}`` dicts from ``quant.core``) are matched
    against the *dense* spec for that weight and sharded via
    :func:`quant_leaf_spec`, so one spec table serves fp16/bf16 and int8
    checkpoints alike.
    """
    from ..quant.core import is_quantized_leaf

    def place(x, spec):
        return global_put(x, NamedSharding(mesh, spec))

    # specs may be a strict subtree (e.g. no lm_head when tied)
    def walk(p, s):
        if is_quantized_leaf(p) and isinstance(s, P):
            qs = quant_leaf_spec(s)
            return {"q": place(p["q"], qs["q"]), "s": place(p["s"], qs["s"])}
        if isinstance(p, dict):
            return {k: walk(v, s[k]) if k in s else v for k, v in p.items()}
        return place(p, s)

    out = {}
    for k, v in params.items():
        if k in specs:
            s = specs[k]
            if k == "lm_head" and is_quantized_leaf(v) and isinstance(s, P):
                # quantize_params stores lm_head transposed [H, V]
                s = P(*reversed(tuple(s)))
            out[k] = walk(v, s)
        else:
            out[k] = global_put(v, NamedSharding(mesh, P()))
    return out
