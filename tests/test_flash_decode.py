"""Parity tests for the Pallas length-aware flash-decode attention kernel
(kernels/flash_decode.py) in interpreter mode against (a) the jnp reference
``flash_decode_ref`` and (b) the model's XLA attention path semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmspeculativesampling_tpu.kernels.flash_decode import (
    flash_decode_attention,
    flash_decode_ref,
)


def _mk(b, hq, hkv, s_new, s_max, d, length, key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(key), 5)
    q = jax.random.normal(ks[0], (b, hq, s_new, d), dtype)
    k_new = jax.random.normal(ks[1], (b, hkv, s_new, d), dtype)
    v_new = jax.random.normal(ks[2], (b, hkv, s_new, d), dtype)
    k_cache = jax.random.normal(ks[3], (b, hkv, s_max, d), dtype)
    v_cache = jax.random.normal(ks[4], (b, hkv, s_max, d), dtype)
    causal = jnp.tril(jnp.ones((s_new, s_new), bool))
    bias = jnp.where(causal, 0.0, -1e30).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[None], (b, s_new, s_new))
    return q, k_new, v_new, k_cache, v_cache, jnp.asarray(length, jnp.int32), bias


@pytest.mark.parametrize(
    "b,hq,hkv,s_new,length",
    [
        (1, 4, 4, 1, 0),      # pure first-decode, no prefix
        (1, 4, 4, 5, 100),    # verify block, partial prefix chunk
        (2, 8, 2, 3, 128),    # GQA, exact chunk boundary
        (1, 4, 4, 1, 256),    # full cache
        (2, 4, 4, 7, 37),     # odd length
    ],
)
def test_dense_matches_ref(b, hq, hkv, s_new, length):
    s_max, d = 256, 64
    q, kn, vn, kc, vc, L, bias = _mk(b, hq, hkv, s_new, s_max, d, length)
    scale = 1.0 / d ** 0.5
    out = flash_decode_attention(
        q, kn, vn, kc, vc, L, bias, scale=scale, interpret=True
    )
    ref = flash_decode_ref(q, kn, vn, kc, vc, L, bias, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tree_bias_matches_ref():
    """Arbitrary (tree) block bias, not just causal."""
    b, hq, hkv, s_new, s_max, d = 1, 4, 4, 6, 256, 64
    q, kn, vn, kc, vc, L, _ = _mk(b, hq, hkv, s_new, s_max, d, 90)
    rng = np.random.default_rng(0)
    vis = np.tril(np.ones((s_new, s_new), bool))
    vis &= rng.random((s_new, s_new)) > 0.3
    np.fill_diagonal(vis, True)
    bias = jnp.where(jnp.asarray(vis)[None], 0.0, -1e30).astype(jnp.float32)
    scale = 1.0 / d ** 0.5
    out = flash_decode_attention(q, kn, vn, kc, vc, L, bias, scale=scale, interpret=True)
    ref = flash_decode_ref(q, kn, vn, kc, vc, L, bias, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_per_row_lengths():
    """Batched rows with different live lengths (continuous-batching shape)."""
    b, hq, hkv, s_new, s_max, d = 3, 2, 2, 2, 256, 64
    q, kn, vn, kc, vc, _, bias = _mk(b, hq, hkv, s_new, s_max, d, 0)
    lengths = jnp.asarray([0, 64, 200], jnp.int32)
    scale = 1.0 / d ** 0.5
    out = flash_decode_attention(q, kn, vn, kc, vc, lengths, bias, scale=scale, interpret=True)
    for i in range(b):
        ref_i = flash_decode_ref(
            q[i : i + 1], kn[i : i + 1], vn[i : i + 1], kc[i : i + 1],
            vc[i : i + 1], lengths[i], bias[i : i + 1], scale=scale,
        )
        np.testing.assert_allclose(
            np.asarray(out[i : i + 1]), np.asarray(ref_i), rtol=2e-4, atol=2e-4
        )


def test_int8_kv_matches_ref():
    from llmspeculativesampling_tpu.cache.kvcache import _quantize_kv

    b, hq, hkv, s_new, s_max, d = 1, 4, 2, 3, 256, 64
    q, kn, vn, kc, vc, L, bias = _mk(b, hq, hkv, s_new, s_max, d, 130)
    kq, ksc = _quantize_kv(kc)
    vq, vsc = _quantize_kv(vc)
    scale = 1.0 / d ** 0.5
    out = flash_decode_attention(
        q, kn, vn, kq, vq, L, bias, scale=scale,
        k_scales=ksc, v_scales=vsc, interpret=True,
    )
    ref = flash_decode_ref(
        q, kn, vn, kq, vq, L, bias, scale=scale, k_scales=ksc, v_scales=vsc
    )
    # int8 path runs bf16 MXU math in the kernel; tolerance accounts for it
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_model_forward_flash_matches_xla(monkeypatch):
    """Force the kernel (interpret) inside the full Llama forward and check
    logits against the XLA attention path."""
    from llmspeculativesampling_tpu.cache.kvcache import init_cache
    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.models import llama

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=1, max_position=512, dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.key(0))
    toks_prefill = jnp.arange(40, dtype=jnp.int32).reshape(1, 40) % 120
    toks_dec = jnp.asarray([[7, 9, 11]], jnp.int32)

    def fresh():
        return init_cache(2, 1, 1, 256, 64, jnp.float32)

    # XLA path
    monkeypatch.setenv("LLMSS_FLASH", "0")
    lg0, c0 = llama.forward(params, cfg, toks_prefill, fresh())
    lg1, _ = llama.forward(params, cfg, toks_dec, c0)

    # kernel path (interpret on CPU), decode step only (prefill uses XLA)
    monkeypatch.setenv("LLMSS_FLASH", "1")
    monkeypatch.setenv("LLMSS_FLASH_INTERPRET", "1")
    lg1f, _ = llama.forward(params, cfg, toks_dec, c0)
    np.testing.assert_allclose(np.asarray(lg1f), np.asarray(lg1), rtol=5e-3, atol=5e-3)


def test_opt_forward_flash_matches_xla(monkeypatch):
    """Same as the Llama check but through models/opt.py (biases, learned
    positions) — the kernel is shared via flash_layer_attention."""
    from llmspeculativesampling_tpu.cache.kvcache import init_cache
    from llmspeculativesampling_tpu.core.config import OPTConfig
    from llmspeculativesampling_tpu.models import opt

    cfg = OPTConfig(
        vocab_size=128, hidden_size=128, ffn_dim=256, num_layers=2,
        num_heads=2, max_position=512, dtype="float32",
    )
    params = opt.init_params(cfg, jax.random.key(0))
    toks_prefill = jnp.arange(40, dtype=jnp.int32).reshape(1, 40) % 120
    toks_dec = jnp.asarray([[7, 9, 11]], jnp.int32)

    def fresh():
        return init_cache(2, 1, 2, 256, 64, jnp.float32)

    monkeypatch.setenv("LLMSS_FLASH", "0")
    lg0, c0 = opt.forward(params, cfg, toks_prefill, fresh())
    lg1, _ = opt.forward(params, cfg, toks_dec, c0)

    monkeypatch.setenv("LLMSS_FLASH", "1")
    monkeypatch.setenv("LLMSS_FLASH_INTERPRET", "1")
    lg1f, _ = opt.forward(params, cfg, toks_dec, c0)
    np.testing.assert_allclose(np.asarray(lg1f), np.asarray(lg1), rtol=5e-3, atol=5e-3)


def test_vmap_collapses_into_batch_axis():
    """jax.vmap over the kernel (the scheduler's slot axis,
    serve/scheduler.py::_batched_spec_step) must collapse into the native
    batch grid via the custom_vmap rule — Mosaic cannot batch a
    scalar-prefetch pallas_call directly."""
    s_lanes, b, hq, hkv, s_new, s_max, d = 3, 1, 4, 2, 5, 256, 64
    ks = jax.random.split(jax.random.key(3), 5)
    q = jax.random.normal(ks[0], (s_lanes, b, hq, s_new, d), jnp.float32)
    kn = jax.random.normal(ks[1], (s_lanes, b, hkv, s_new, d), jnp.float32)
    vn = jax.random.normal(ks[2], (s_lanes, b, hkv, s_new, d), jnp.float32)
    kc = jax.random.normal(ks[3], (s_lanes, b, hkv, s_max, d), jnp.float32)
    vc = jax.random.normal(ks[4], (s_lanes, b, hkv, s_max, d), jnp.float32)
    lengths = jnp.asarray([[37], [128], [0]], jnp.int32)  # per-lane [B]
    causal = jnp.tril(jnp.ones((s_new, s_new), bool))
    bias = jnp.broadcast_to(
        jnp.where(causal, 0.0, -1e30).astype(jnp.float32)[None, None],
        (s_lanes, b, s_new, s_new),
    )
    scale = 1.0 / d ** 0.5

    out = jax.vmap(
        lambda *a: flash_decode_attention(*a, scale=scale, interpret=True)
    )(q, kn, vn, kc, vc, lengths, bias)
    ref = jax.vmap(lambda *a: flash_decode_ref(*a, scale=scale))(
        q, kn, vn, kc, vc, lengths, bias
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_vmap_int8_kv_collapses_into_batch_axis():
    from llmspeculativesampling_tpu.cache.kvcache import _quantize_kv

    s_lanes, b, hq, hkv, s_new, s_max, d = 2, 1, 4, 4, 3, 256, 64
    ks = jax.random.split(jax.random.key(4), 5)
    q = jax.random.normal(ks[0], (s_lanes, b, hq, s_new, d), jnp.float32)
    kn = jax.random.normal(ks[1], (s_lanes, b, hkv, s_new, d), jnp.float32)
    vn = jax.random.normal(ks[2], (s_lanes, b, hkv, s_new, d), jnp.float32)
    kc = jax.random.normal(ks[3], (s_lanes, b, hkv, s_max, d), jnp.float32)
    vc = jax.random.normal(ks[4], (s_lanes, b, hkv, s_max, d), jnp.float32)
    kq, ksc = _quantize_kv(kc)
    vq, vsc = _quantize_kv(vc)
    lengths = jnp.asarray([[130], [64]], jnp.int32)
    causal = jnp.tril(jnp.ones((s_new, s_new), bool))
    bias = jnp.broadcast_to(
        jnp.where(causal, 0.0, -1e30).astype(jnp.float32)[None, None],
        (s_lanes, b, s_new, s_new),
    )
    scale = 1.0 / d ** 0.5

    out = jax.vmap(
        lambda q, kn, vn, kq, vq, L, bias, ksc, vsc: flash_decode_attention(
            q, kn, vn, kq, vq, L, bias, scale=scale,
            k_scales=ksc, v_scales=vsc, interpret=True,
        )
    )(q, kn, vn, kq, vq, lengths, bias, ksc, vsc)
    ref = jax.vmap(
        lambda q, kn, vn, kq, vq, L, bias, ksc, vsc: flash_decode_ref(
            q, kn, vn, kq, vq, L, bias, scale=scale, k_scales=ksc, v_scales=vsc,
        )
    )(q, kn, vn, kq, vq, lengths, bias, ksc, vsc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
