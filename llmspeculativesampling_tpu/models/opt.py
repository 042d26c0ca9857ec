"""JAX OPT decoder (L1) — second model family (opt-125m ... opt-13b).

Capability parity with the reference's forked model
(/root/reference/sampling/models/modeling_opt.py):
  * learned positional embeddings with the OPT +2 offset, taking *explicit*
    position ids (the reference's patch at modeling_opt.py:109-124 — tree
    nodes at the same depth must share a position),
  * arbitrary tree-attention mask over the new-token block
    (``extra_attention_mask`` injection, modeling_opt.py:572,660-665),
  * pre-LayerNorm ReLU architecture, optional word-embed projections
    (opt-350m), tied lm_head.

Same TPU design as models/llama.py: stacked-layer ``lax.scan`` body,
static-shape KV cache, fp32 softmax/LayerNorm.
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
)
from ..core.config import OPTConfig
from ..kernels import flash_decode
from .linear import linear, lm_head_logits
from .llama import (
    attention_mask,
    block_bias,
    flash_layer_attention,
    paged_flash_layer_attention,
)

_POS_OFFSET = 2  # OPT quirk: positional table rows 0/1 are reserved


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def forward(
    params: dict,
    cfg: OPTConfig,
    tokens: jax.Array,
    cache: KVCache,
    positions: Optional[jax.Array] = None,
    tree_mask: Optional[jax.Array] = None,
    paged_prefill: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Decode ``tokens`` [B, S] -> (logits [B, S, V] fp32, cache+S).

    ``cache`` may be a contiguous :class:`KVCache`/:class:`QuantKVCache`
    or a paged ``PagedKVCache``/``QuantPagedKVCache`` — same dispatch as
    ``models/llama.py::forward`` (block pool, per-row block tables and
    lengths), so the opt-125m/opt-13b reference pairing
    (/root/reference/README.md:11) can ride the paged serving engine.
    ``paged_prefill=True`` asserts empty rows: block-only attention with
    one deferred all-layers pool scatter (see llama.py's rationale for
    why the pool never mutates inside the layer scan)."""
    b, s = tokens.shape
    paged = paged_cache.is_paged(cache)
    s_max = cache.max_pages * cache.page if paged else cache.max_len
    dtype = cfg.jnp_dtype
    if positions is None:
        ln = jnp.asarray(cache.length, jnp.int32)
        off = ln if ln.ndim == 0 else ln[:, None]
        positions = off + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)

    if paged:
        # gate on the POOL's head dim (pad-to-128 lane rescue; see
        # models/llama.py + cache/paged.py pad_head_dim)
        pool_d = (cache.k_q if hasattr(cache, "k_q") else cache.k).shape[-1]
        use_flash = not paged_prefill and flash_decode.should_use_paged(
            s, cache.page, pool_d, cfg.flash,
            quant=isinstance(cache, paged_cache.QuantPagedKVCache),
        )
    else:
        use_flash = flash_decode.should_use(
            s, s_max, cfg.head_dim, cfg.flash,
            quant=isinstance(cache, QuantKVCache),
        )
    defer_write = paged and (use_flash or paged_prefill)
    if use_flash or paged_prefill:
        bias_blk = block_bias(s, tree_mask, b)
        bias = None
    else:
        mask = attention_mask(cache.length, s, s_max, tree_mask, b)
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None]

    h = jnp.take(params["embed"], tokens, axis=0).astype(dtype)
    if "project_in" in params:
        h = h @ params["project_in"]
    h = h + jnp.take(params["embed_pos"], positions + _POS_OFFSET, axis=0).astype(dtype)

    n_heads, head_dim = cfg.num_heads, cfg.head_dim
    scale = 1.0 / float(head_dim) ** 0.5

    def layer_fn(h, xs):
        lp, cache_slices = xs
        residual = h
        r = layer_norm(h, lp["ln_attn_w"], lp["ln_attn_b"], cfg.layer_norm_eps) \
            if cfg.do_layer_norm_before else h
        q = linear(r, lp["wq"], lp["bq"]).reshape(b, s, n_heads, head_dim)
        k = linear(r, lp["wk"], lp["bk"]).reshape(b, s, n_heads, head_dim)
        v = linear(r, lp["wv"], lp["bv"]).reshape(b, s, n_heads, head_dim)

        if paged and paged_prefill:
            # block-only causal self-attention over empty rows; pool
            # write deferred to the post-scan scatter
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "bhsd,bhtd->bhst", qh, kh, preferred_element_type=jnp.float32
            )
            scores = scores * scale + bias_blk[:, None]
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            ctx = jnp.einsum(
                "bhst,bhtd->bhsd", probs, vh, preferred_element_type=jnp.float32
            )
            ctx = ctx.astype(dtype).transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        elif use_flash and paged:
            pad = lambda x: paged_cache.pad_head_dim(x, pool_d)
            ctx = paged_flash_layer_attention(
                pad(q), pad(k), pad(v), cache_slices, cache.block_tables,
                cache.lengths, bias_blk, scale, dtype, out_d=head_dim,
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
            if paged and pool_d != head_dim:
                q = paged_cache.pad_head_dim(q, pool_d)  # zero lanes score 0
            qh = q.transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhsd,bhtd->bhst", qh, k_all, preferred_element_type=jnp.float32)
            scores = scores * scale + bias
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            ctx = jnp.einsum("bhst,bhtd->bhsd", probs, v_all, preferred_element_type=jnp.float32)
            ctx = ctx[..., :head_dim]  # un-pad (no-op when equal)
            ctx = ctx.astype(dtype).transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        h = residual + linear(ctx, lp["wo"], lp["bo"])
        if not cfg.do_layer_norm_before:
            h = layer_norm(h, lp["ln_attn_w"], lp["ln_attn_b"], cfg.layer_norm_eps)

        residual = h
        r = layer_norm(h, lp["ln_mlp_w"], lp["ln_mlp_b"], cfg.layer_norm_eps) \
            if cfg.do_layer_norm_before else h
        r = jax.nn.relu(linear(r, lp["fc1_w"], lp["fc1_b"]))
        h = residual + linear(r, lp["fc2_w"], lp["fc2_b"])
        if not cfg.do_layer_norm_before:
            h = layer_norm(h, lp["ln_mlp_w"], lp["ln_mlp_b"], cfg.layer_norm_eps)
        if defer_write:
            return h, (k, v)
        return h, cache_slices

    slices0 = (
        paged_cache.paged_layer_scan_slices(cache) if paged else layer_scan_slices(cache)
    )
    h, new_slices = jax.lax.scan(layer_fn, h, (params["layers"], slices0))

    if "ln_final_w" in params and cfg.do_layer_norm_before:
        h = layer_norm(h, params["ln_final_w"], params["ln_final_b"], cfg.layer_norm_eps)
    if "project_out" in params:
        h = h @ params["project_out"]
    head = params.get("lm_head", params["embed"])
    logits = lm_head_logits(h, head)

    if defer_write:
        k_stack, v_stack = new_slices  # [L, B, S, H, D]
        cache = paged_cache.paged_write_layers(cache, k_stack, v_stack)
        return logits, dataclasses.replace(
            cache, lengths=jnp.asarray(cache.lengths + s, jnp.int32)
        )
    if paged:
        return logits, paged_cache.paged_rebuild(cache, new_slices, cache.lengths + s)
    return logits, rebuild(cache, new_slices, cache.length + s)


def init_params(cfg: OPTConfig, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    keys = jax.random.split(key, 8)
    h, f, v, l, e = cfg.hidden_size, cfg.ffn_dim, cfg.vocab_size, cfg.num_layers, cfg.embed_dim
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dt)

    layers = {
        "wq": rnd(keys[0], (l, h, h)), "bq": jnp.zeros((l, h), dt),
        "wk": rnd(keys[1], (l, h, h)), "bk": jnp.zeros((l, h), dt),
        "wv": rnd(keys[2], (l, h, h)), "bv": jnp.zeros((l, h), dt),
        "wo": rnd(keys[3], (l, h, h)), "bo": jnp.zeros((l, h), dt),
        "ln_attn_w": jnp.ones((l, h), dt), "ln_attn_b": jnp.zeros((l, h), dt),
        "fc1_w": rnd(keys[4], (l, h, f)), "fc1_b": jnp.zeros((l, f), dt),
        "fc2_w": rnd(keys[5], (l, f, h)), "fc2_b": jnp.zeros((l, h), dt),
        "ln_mlp_w": jnp.ones((l, h), dt), "ln_mlp_b": jnp.zeros((l, h), dt),
    }
    params = {
        "embed": rnd(keys[6], (v, e)),
        "embed_pos": rnd(keys[7], (cfg.max_position + _POS_OFFSET, h)),
        "layers": layers,
        "ln_final_w": jnp.ones((h,), dt),
        "ln_final_b": jnp.zeros((h,), dt),
    }
    if cfg.word_embed_proj_dim:
        k1, k2 = jax.random.split(keys[6])
        params["project_in"] = rnd(k1, (e, h))
        params["project_out"] = rnd(k2, (h, e))
    return params
