"""JAX Llama decoder (L1), written TPU-first — not a port of HF.

Also serves the Qwen2 (``cfg.qkv_bias=True``) and Mistral families — both
are architecturally this decoder (the reference harness reaches such
models via its AutoModelForCausalLM fallback, evaluation.py:237).

Capability parity with the reference's forked model
(/root/reference/sampling/models/modeling_llama.py):
  * standard causal incremental decode over a KV cache,
  * an *arbitrary tree-attention mask* over the newly-fed token block
    (reference ``extra_attention_mask``, modeling_llama.py:635,684-689),
  * explicit position ids (tree nodes at equal depth share a position).

Design:
  * Pure function of a param pytree; per-layer weights are stacked on a
    leading ``L`` axis and the decoder body is one ``lax.scan`` — compile
    time is O(1) in depth and XLA fuses each layer into a few MXU ops.
  * The KV cache is the static-shape buffer from ``cache.kvcache``;
    attention always spans ``[0, S_max)`` with validity derived from the
    ``length`` pointer, so every decode step has identical shapes.
  * Weights live in bf16 (configurable), matmuls accumulate in fp32
    (``preferred_element_type``), softmax/RMSNorm run in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import paged as paged_cache
from ..cache.kvcache import (
    KVCache,
    QuantKVCache,
    layer_scan_slices,
    rebuild,
    update_and_read_layer,
    write_layer,
    write_layer_quant,
)
from ..core.config import LlamaConfig
from ..kernels import flash_decode
from .linear import linear, lm_head_logits

_MASK_VALUE = -1e30


def block_bias(s_new: int, tree_mask, batch: int) -> jax.Array:
    """Additive [B, S_new, S_new] bias over the new-token block: causal by
    default, or the tree mask (reference extra_attention_mask semantics,
    modeling_llama.py:684-689)."""
    if tree_mask is None:
        causal = jnp.tril(jnp.ones((s_new, s_new), bool))
        vis = jnp.broadcast_to(causal[None], (batch, s_new, s_new))
    else:
        vis = tree_mask.astype(bool)
    return jnp.where(vis, 0.0, _MASK_VALUE).astype(jnp.float32)


def paged_flash_layer_attention(
    q, k, v, cache_slices, block_tables, lengths, bias_blk, scale, dtype,
    out_d=None,
):
    """One layer's attention via the paged flash kernel: DMA the prefix
    page-by-page through the block table — the gathered [B, P*page]
    contiguous view of the XLA fallback never materializes.

    The pool slices are READ-ONLY here: the kernel attends to the new
    block from VMEM, so the pool write is deferred to one batched
    all-layers scatter after the layer scan
    (cache/paged.py::paged_write_layers) — keeping the stacked pool a
    pure scan input, which XLA holds in a single HBM buffer (a per-layer
    in-scan scatter forces a second live copy of the whole pool)."""
    b, s = q.shape[0], q.shape[1]
    kn = k.transpose(0, 2, 1, 3)
    vn = v.transpose(0, 2, 1, 3)
    qh = q.transpose(0, 2, 1, 3)
    if len(cache_slices) == 4:
        k_q, k_s, v_q, v_s = cache_slices
        ctx = flash_decode.paged_flash_decode_attention(
            qh, kn.astype(dtype), vn.astype(dtype), k_q, v_q,
            block_tables, lengths, bias_blk, scale=scale,
            k_scales=k_s, v_scales=v_s,
        )
    else:
        k_p, v_p = cache_slices
        ctx = flash_decode.paged_flash_decode_attention(
            qh, kn.astype(dtype), vn.astype(dtype), k_p, v_p,
            block_tables, lengths, bias_blk, scale=scale,
        )
    if out_d is not None and out_d != ctx.shape[-1]:
        ctx = ctx[..., :out_d]  # padded-pool lanes carry zeros
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, -1)


def flash_layer_attention(q, k, v, cache_slices, length, bias_blk, scale, dtype):
    """One layer's attention via the length-aware Pallas kernel
    (kernels/flash_decode.py). ``q``/``k``/``v``: [B, S, H, D] fresh
    projections; writes the new block into the layer's cache slices and
    attends over [0, length) + the new block without reading dead cache.
    Returns (new_slices, ctx [B, S, hidden])."""
    b, s = q.shape[0], q.shape[1]
    kn = k.transpose(0, 2, 1, 3)
    vn = v.transpose(0, 2, 1, 3)
    qh = q.transpose(0, 2, 1, 3)
    if len(cache_slices) == 4:
        k_q_l, k_s_l, v_q_l, v_s_l = write_layer_quant(*cache_slices, length, kn, vn)
        new_slices = (k_q_l, k_s_l, v_q_l, v_s_l)
        ctx = flash_decode.flash_decode_attention(
            qh, kn.astype(dtype), vn.astype(dtype), k_q_l, v_q_l, length,
            bias_blk, scale=scale, k_scales=k_s_l, v_scales=v_s_l,
        )
    else:
        k_l, v_l = write_layer(cache_slices[0], cache_slices[1], length, kn, vn)
        new_slices = (k_l, v_l)
        ctx = flash_decode.flash_decode_attention(
            qh, kn.astype(dtype), vn.astype(dtype), k_l, v_l, length,
            bias_blk, scale=scale,
        )
    return new_slices, ctx.transpose(0, 2, 1, 3).reshape(b, s, -1)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(
    positions: jax.Array,
    head_dim: int,
    theta: float,
    scaling: tuple | None = None,
    max_position: int = 0,
):
    """cos/sin tables for given positions. positions: [B, S] -> [B, S, D].

    ``scaling``: None or ("linear"|"dynamic", factor) — the reference's
    two rotary-scaling variants (modeling_llama.py:128-160):
      * linear: positions are divided by the factor before the angle
        product (LlamaLinearScalingRotaryEmbedding, :128-146).
      * dynamic NTK: when the current total length exceeds
        ``max_position``, the base is rescaled to
        theta * ((factor*len/max_pos) - (factor-1)) ** (D/(D-2))
        (LlamaDynamicNTKScalingRotaryEmbedding, :148-160). The "current
        total length" is max(positions)+1 — the kv length HF passes as
        ``seq_len``; like HF incremental decoding, earlier cached k/v
        keep the base they were written with.
    """
    pos = positions.astype(jnp.float32)
    base = jnp.float32(theta)
    if scaling is not None:
        kind, factor = scaling
        if kind == "linear":
            pos = pos / jnp.float32(factor)
        elif kind == "dynamic":
            seq_len = jnp.max(positions).astype(jnp.float32) + 1.0
            dyn = base * (
                (factor * seq_len / max_position) - (factor - 1.0)
            ) ** (head_dim / (head_dim - 2))
            base = jnp.where(seq_len > max_position, dyn, base)
        else:  # loader.parse_rope_scaling already rejects these
            raise ValueError(f"unknown rope scaling kind {kind!r}")
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = pos[..., None] * inv_freq  # [B,S,D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # HF half-duplicated layout
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B, S, D] (HF rotate_half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def attention_mask(
    length: jax.Array,
    s_new: int,
    s_max: int,
    tree_mask: Optional[jax.Array],
    batch: int,
) -> jax.Array:
    """Boolean visibility [B, S_new, S_max].

    Prefix positions (< length) are fully visible (matches the reference's
    full-visibility-on-prefix tree semantics, utils.py:143-144); the new
    block is causal unless ``tree_mask`` [B, S_new, S_new] overrides it;
    positions >= length + S_new are dead.

    ``length`` may be a scalar (all rows share one cache length) or a
    per-row [B] vector (paged serving batches with heterogeneous lengths).
    """
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_new, s_max), 2)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (1, s_new, s_max), 1)
    ln = jnp.asarray(length, jnp.int32).reshape(-1)[:, None, None]  # [1|B,1,1]
    prefix_vis = kv_pos < ln
    in_block = (kv_pos >= ln) & (kv_pos < ln + s_new)
    if tree_mask is None:
        block_vis = in_block & ((kv_pos - ln) <= q_idx)
        return jnp.broadcast_to(prefix_vis | block_vis, (batch, s_new, s_max))
    # place the [B, S_new, S_new] tree mask at per-row kv offset `length`
    # via a clipped gather over the block column (works for scalar and
    # per-row lengths alike)
    col = jnp.clip(kv_pos - ln, 0, s_new - 1)  # [1|B, S_new, S_max]
    col = jnp.broadcast_to(col, (batch, s_new, s_max))
    tree_full = jnp.take_along_axis(tree_mask.astype(bool), col, axis=2)
    return jnp.broadcast_to(prefix_vis, (batch, s_new, s_max)) | (
        jnp.broadcast_to(in_block, (batch, s_new, s_max)) & tree_full
    )


def forward(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,
    cache: KVCache,
    positions: Optional[jax.Array] = None,
    tree_mask: Optional[jax.Array] = None,
    paged_prefill: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder over ``tokens`` [B, S] given ``cache``.

    Writes the S new positions' k/v at ``cache.length`` and returns
    (logits [B, S, V] float32, cache with length += S).

    ``cache`` may be a contiguous :class:`KVCache`/:class:`QuantKVCache`
    (scalar length, all rows aligned) or a paged
    ``PagedKVCache``/``QuantPagedKVCache`` (cache/paged.py: shared block
    pool, per-row block tables and lengths — the serving path).

    ``paged_prefill=True`` (paged caches only) asserts every row's cache
    is empty (lengths == 0): attention runs block-only (pure causal self
    attention, no pool reads at all) and the pool write happens as one
    deferred all-layers scatter — the path serve/paged.py admissions
    take.
    """
    b, s = tokens.shape
    paged = paged_cache.is_paged(cache)
    s_max = cache.max_pages * cache.page if paged else cache.max_len
    dtype = cfg.jnp_dtype

    if positions is None:
        ln = jnp.asarray(cache.length, jnp.int32)
        off = ln if ln.ndim == 0 else ln[:, None]
        positions = off + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)

    cos, sin = rope_tables(
        positions, cfg.head_dim, cfg.rope_theta,
        getattr(cfg, "rope_scaling", None), cfg.max_position,
    )
    if paged:
        # the POOL may be wider than the model head_dim (pad-to-128 lane
        # rescue: a D<128 draft pool allocated at D=128 rides the native
        # flash lane; cache/paged.py pad_head_dim) — gate on the pool's D
        pool_d = (cache.k_q if hasattr(cache, "k_q") else cache.k).shape[-1]
        use_flash = not paged_prefill and flash_decode.should_use_paged(
            s, cache.page, pool_d, cfg.flash,
            quant=isinstance(cache, paged_cache.QuantPagedKVCache),
        )
    else:
        use_flash = flash_decode.should_use(
            s, s_max, cfg.head_dim, cfg.flash, quant=isinstance(cache, QuantKVCache)
        )
    # Paged flash decode and paged prefill never mutate the pool inside
    # the layer scan: the new k/v stack rides the scan as ys and is
    # scattered once after it (paged_write_layers). A per-layer in-scan
    # scatter makes the stacked pool BOTH a scan input and a scan output
    # and XLA holds two live full-pool copies (measured 2 x 800 MB at 13B
    # geometry, write-only or not). The prefill stack costs
    # L*B*S_bucket*H*D*4 bytes, so admissions are token-budgeted
    # (serve/paged.py prefill_token_budget).
    defer_write = paged and (use_flash or paged_prefill)
    if use_flash or paged_prefill:
        bias_blk = block_bias(s, tree_mask, b)  # [B, S, S]
        bias = None
    else:
        mask = attention_mask(cache.length, s, s_max, tree_mask, b)
        # kv validity also applies per-position beyond the block (dead slots)
        bias = jnp.where(mask, 0.0, _MASK_VALUE).astype(jnp.float32)[:, None]  # [B,1,S,S_max]

    h = jnp.take(params["embed"], tokens, axis=0).astype(dtype)
    n_rep = cfg.num_heads // cfg.num_kv_heads
    scale = 1.0 / float(cfg.head_dim) ** 0.5

    def layer_fn(h, xs):
        lp, cache_slices = xs
        r = rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
        # qkv biases exist only for the Qwen2 variant (cfg.qkv_bias);
        # lp.get resolves the tree structure at trace time
        q = linear(r, lp["wq"], lp.get("bq")).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = linear(r, lp["wk"], lp.get("bk")).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = linear(r, lp["wv"], lp.get("bv")).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if paged and paged_prefill:
            # block-only causal self-attention: rows are empty (lengths
            # all 0), so the pool contributes nothing — no reads, write
            # deferred to the one post-scan scatter
            qh = q.transpose(0, 2, 1, 3).reshape(
                b, cfg.num_kv_heads, n_rep, s, cfg.head_dim
            )
            kh = k.transpose(0, 2, 1, 3)  # [B, H_kv, S, D]
            vh = v.transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "bhgsd,bhtd->bhgst", qh, kh, preferred_element_type=jnp.float32
            )
            scores = scores * scale + bias_blk[:, None, None]
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            ctx = jnp.einsum(
                "bhgst,bhtd->bhgsd", probs, vh, preferred_element_type=jnp.float32
            )
            ctx = ctx.astype(dtype).reshape(b, cfg.num_heads, s, cfg.head_dim)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        elif use_flash and paged:
            pad = lambda x: paged_cache.pad_head_dim(x, pool_d)
            ctx = paged_flash_layer_attention(
                pad(q), pad(k), pad(v), cache_slices, cache.block_tables,
                cache.lengths, bias_blk, scale, dtype, out_d=cfg.head_dim,
            )
            ctx = ctx.astype(dtype)
        elif use_flash:
            cache_slices, ctx = flash_layer_attention(
                q, k, v, cache_slices, cache.length, bias_blk, scale, dtype
            )
            ctx = ctx.astype(dtype)
        else:
            if paged:
                cache_slices, k_all, v_all = paged_cache.paged_update_and_read_layer(
                    cache_slices, cache.block_tables, cache.lengths,
                    k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), dtype,
                )
            else:
                cache_slices, k_all, v_all = update_and_read_layer(
                    cache_slices, cache.length,
                    k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), dtype,
                )

            # GQA as a grouped einsum: q [B, H_kv, G, S, D] against the
            # shared kv head — never materializes an Hq-repeated KV in HBM
            # (the reference's repeat_kv, modeling_llama.py:225-234, does).
            if paged and pool_d != cfg.head_dim:
                # padded pool: widen q (zero lanes score 0) and narrow ctx
                q = paged_cache.pad_head_dim(q, pool_d)
            att_d = pool_d if paged else cfg.head_dim
            qh = q.transpose(0, 2, 1, 3).reshape(b, cfg.num_kv_heads, n_rep, s, att_d)
            scores = jnp.einsum(
                "bhgsd,bhtd->bhgst", qh, k_all, preferred_element_type=jnp.float32
            )
            scores = scores * scale + bias[:, :, None]
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            ctx = jnp.einsum(
                "bhgst,bhtd->bhgsd", probs, v_all, preferred_element_type=jnp.float32
            )
            ctx = ctx.astype(dtype).reshape(b, cfg.num_heads, s, att_d)
            ctx = ctx[..., : cfg.head_dim]  # un-pad (no-op when equal)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        h = h + linear(ctx, lp["wo"])

        r = rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps)
        gate = jax.nn.silu(linear(r, lp["w_gate"]).astype(jnp.float32)).astype(dtype)
        up = linear(r, lp["w_up"])
        h = h + linear(gate * up, lp["w_down"])
        if defer_write:
            # stack the post-rope new k/v [B, S, H_kv, D] for the one
            # deferred pool write; the pool slices stay scan-read-only
            return h, (k, v)
        return h, cache_slices

    slices0 = (
        paged_cache.paged_layer_scan_slices(cache) if paged else layer_scan_slices(cache)
    )
    h, new_slices = jax.lax.scan(layer_fn, h, (params["layers"], slices0))

    h = rms_norm(h, params["ln_final"], cfg.rms_norm_eps)
    lm_head = params["embed"] if cfg.tie_embeddings else params["lm_head"]
    logits = lm_head_logits(h, lm_head)

    if defer_write:
        k_stack, v_stack = new_slices  # [L, B, S, H_kv, D]
        cache = paged_cache.paged_write_layers(cache, k_stack, v_stack)
        return logits, dataclasses.replace(
            cache, lengths=jnp.asarray(cache.lengths + s, jnp.int32)
        )
    if paged:
        return logits, paged_cache.paged_rebuild(cache, new_slices, cache.lengths + s)
    return logits, rebuild(cache, new_slices, cache.length + s)


def init_params(cfg: LlamaConfig, key: jax.Array) -> dict:
    """Random init (testing / benchmarks without checkpoints)."""
    dt = cfg.jnp_dtype
    keys = jax.random.split(key, 8)
    h, i, v, l = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
    kvh = cfg.num_kv_heads * cfg.head_dim
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dt)

    layers = {
        "wq": rnd(keys[0], (l, h, h)),
        "wk": rnd(keys[1], (l, h, kvh)),
        "wv": rnd(keys[2], (l, h, kvh)),
        "wo": rnd(keys[3], (l, h, h)),
        "w_gate": rnd(keys[4], (l, h, i)),
        "w_up": rnd(keys[5], (l, h, i)),
        "w_down": rnd(keys[6], (l, i, h)),
        "ln_attn": jnp.ones((l, h), dt),
        "ln_mlp": jnp.ones((l, h), dt),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((l, h), dt)
        layers["bk"] = jnp.zeros((l, kvh), dt)
        layers["bv"] = jnp.zeros((l, kvh), dt)
    params = {
        "embed": rnd(keys[7], (v, h)),
        "layers": layers,
        "ln_final": jnp.ones((h,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = rnd(jax.random.split(keys[7])[0], (v, h))
    return params
