"""M5 quantization tests: Pallas int8 dequant-matmul (interpret mode as the
CPU 'fake backend'), per-channel weight quantization quality, the int8 KV
cache, and end-to-end engine runs with a quantized target.

The reference has no in-repo quantization kernels (GPTQ/AWQ are loaded
through external CUDA packages, experiment_multi.py:218-223); these tests
define the TPU build's own correctness bar.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import (
    KVCache,
    QuantKVCache,
    compact_tree_paths,
    init_cache,
    init_quant_cache,
    repeat_rows,
    rollback,
    select_rows,
    write_layer,
    write_layer_quant,
)
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.speculative import speculative_generate
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.kernels.int8_matmul import (
    _int8_matmul_2d,
    int8_matmul,
    int8_matmul_ref,
)
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.quant import (
    dequantize_tensor,
    quantize_params,
    quantize_tensor,
)


# ------------------------------------------------------------ kernel parity
@pytest.mark.parametrize(
    "m,k,n",
    [(16, 128, 128), (37, 384, 640), (1, 256, 512), (130, 512, 384)],
)
def test_int8_matmul_interpret_matches_ref(m, k, n):
    kx, kw = jax.random.split(jax.random.key(m * 7 + n))
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (k, n), jnp.float32)
    q = quantize_tensor(w)
    ref = int8_matmul_ref(x, q["q"], q["s"])
    pal = int8_matmul(x, q["q"], q["s"], interpret=True, block_m=32, block_n=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(pal, np.float32), np.asarray(ref, np.float32), rtol=0.03, atol=0.05
    )


def test_int8_matmul_leading_dims():
    kx, kw = jax.random.split(jax.random.key(3))
    x = jax.random.normal(kx, (2, 5, 64), jnp.float32)
    w = jax.random.normal(kw, (64, 96), jnp.float32)
    q = quantize_tensor(w)
    out = int8_matmul(x, q["q"], q["s"], force_ref=True)
    assert out.shape == (2, 5, 96)
    dense = x @ dequantize_tensor(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=0.05, atol=0.05)


# ------------------------------------------------------- quantization error
def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.key(0), (256, 192), jnp.float32)
    q = quantize_tensor(w)
    assert q["q"].dtype == jnp.int8 and q["s"].shape == (192,)
    deq = dequantize_tensor(q, jnp.float32)
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.012  # int8 per-channel: sub-percent rms

    # stacked-layer layout quantizes per (L, N)
    ws = jax.random.normal(jax.random.key(1), (3, 64, 48), jnp.float32)
    qs = quantize_tensor(ws)
    assert qs["s"].shape == (3, 48)


def _tiny_cfg(**kw):
    d = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position=128, dtype="float32",
    )
    d.update(kw)
    return LlamaConfig(**d)


def test_quantized_llama_forward_close_to_dense():
    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.key(0))
    qparams = quantize_params(params, "llama", quantize_lm_head=True)
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8
    assert qparams["lm_head"]["q"].shape == (cfg.hidden_size, cfg.vocab_size)

    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg.vocab_size)
    c0 = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    logits_d, _ = llama.forward(params, cfg, tokens, c0)
    logits_q, _ = llama.forward(qparams, cfg, tokens, c0)
    p_d = jax.nn.softmax(logits_d[0, -1])
    p_q = jax.nn.softmax(logits_q[0, -1])
    assert float(jnp.sum(jnp.abs(p_d - p_q))) < 0.05  # TV distance
    assert int(jnp.argmax(p_d)) == int(jnp.argmax(p_q))


# ------------------------------------------------------------ fp8 weight path
def test_fp8_quantize_roundtrip_and_error_vs_int8():
    """fp8 e4m3 weight-only (north-star 'INT8/FP8'): round-trip works and
    — as the format analysis in quant/core.py predicts — its per-channel
    rms error is WORSE than int8's at equal bytes/weight (float grid's
    3 mantissa bits vs the uniform 255-level grid; the extra dynamic
    range is wasted once a per-channel scale normalizes)."""
    w = jax.random.normal(jax.random.key(0), (256, 192), jnp.float32)
    q8 = quantize_tensor(w, "int8")
    qf = quantize_tensor(w, "fp8_e4m3")
    assert qf["q"].dtype == jnp.float8_e4m3fn and qf["s"].shape == (192,)
    rel8 = float(jnp.linalg.norm(dequantize_tensor(q8, jnp.float32) - w)
                 / jnp.linalg.norm(w))
    relf = float(jnp.linalg.norm(dequantize_tensor(qf, jnp.float32) - w)
                 / jnp.linalg.norm(w))
    assert relf < 0.05          # still a faithful weight format
    assert relf > rel8          # ...but strictly worse than int8
    with pytest.raises(ValueError):
        quantize_tensor(w, "int4")


def test_fp8_llama_forward_and_engine():
    """fp8-quantized target: forward stays close to dense and the
    speculative engine runs end-to-end (dispatch on q.dtype through the
    same linear/matmul path as int8)."""
    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.key(0))
    qparams = quantize_params(params, "llama", quantize_lm_head=True,
                              fmt="fp8_e4m3")
    assert qparams["layers"]["wq"]["q"].dtype == jnp.float8_e4m3fn
    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg.vocab_size)
    c0 = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    logits_d, _ = llama.forward(params, cfg, tokens, c0)
    logits_q, _ = llama.forward(qparams, cfg, tokens, c0)
    p_d = jax.nn.softmax(logits_d[0, -1])
    p_q = jax.nn.softmax(logits_q[0, -1])
    assert float(jnp.sum(jnp.abs(p_d - p_q))) < 0.12  # TV distance
    assert int(jnp.argmax(p_d)) == int(jnp.argmax(p_q))

    cfg_d = _tiny_cfg(num_layers=1)
    pd = {
        "embed": params["embed"], "ln_final": params["ln_final"],
        "lm_head": params["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], params["layers"]),
    }
    bt = ModelBundle("llama", cfg, llama.forward)
    bd = ModelBundle("llama", cfg_d, llama.forward)
    out = speculative_generate(
        bd, pd, bt, qparams, list(range(5, 20)), 12, gamma=3, eos_token_id=-1,
        temperature=1.0, top_k=10, top_p=0.9, key=jax.random.key(7),
    )
    out = np.asarray(out)
    assert 15 + 12 <= out.shape[0] <= 15 + 12 + 3  # burst overshoot <= gamma
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


# -------------------------------------------------------- quantized KV cache
def test_quant_kv_cache_write_read_roundtrip():
    k_new = jax.random.normal(jax.random.key(0), (2, 4, 8, 16), jnp.float32)
    v_new = jax.random.normal(jax.random.key(1), (2, 4, 8, 16), jnp.float32)
    c = init_quant_cache(1, 2, 4, 32, 16)
    kq, ks, vq, vs = write_layer_quant(
        c.k_q[0], c.k_s[0], c.v_q[0], c.v_s[0], jnp.int32(3), k_new, v_new
    )
    deq = (kq.astype(jnp.float32) * ks[..., None])[:, :, 3:11]
    rel = float(jnp.linalg.norm(deq - k_new) / jnp.linalg.norm(k_new))
    assert rel < 0.01
    assert float(jnp.abs(kq[:, :, :3]).max()) == 0  # untouched slots


def test_quant_cache_decode_matches_dense_cache():
    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.key(0))
    tokens = jax.random.randint(jax.random.key(1), (1, 12), 0, cfg.vocab_size)
    cd = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    cq = init_quant_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim)

    ld, cd = llama.forward(params, cfg, tokens, cd)
    lq, cq = llama.forward(params, cfg, tokens, cq)
    assert isinstance(cq, QuantKVCache) and int(cq.length) == 12
    # incremental step on both caches
    nxt = jnp.argmax(ld[:, -1:], axis=-1).astype(jnp.int32)
    ld2, _ = llama.forward(params, cfg, nxt, cd)
    lq2, _ = llama.forward(params, cfg, nxt, cq)
    p_d = jax.nn.softmax(ld2[0, -1])
    p_q = jax.nn.softmax(lq2[0, -1])
    assert float(jnp.sum(jnp.abs(p_d - p_q))) < 0.05
    assert int(jnp.argmax(p_d)) == int(jnp.argmax(p_q))


def test_quant_cache_ops_shapes():
    c = init_quant_cache(2, 3, 4, 16, 8)
    c = QuantKVCache(c.k_q, c.v_q, c.k_s, c.v_s, jnp.int32(10))
    r = rollback(c, 4)
    assert isinstance(r, QuantKVCache) and int(r.length) == 4
    s = select_rows(c, jnp.array([2, 0], jnp.int32))
    assert s.k_q.shape == (2, 2, 4, 16, 8) and s.k_s.shape == (2, 2, 4, 16)
    rep = repeat_rows(c, 2)
    assert rep.batch == 6

    path_idx = jnp.zeros((3, 4), jnp.int32)
    path_valid = jnp.array([[True, True, False, False]] * 3)
    cc = compact_tree_paths(c, path_idx, path_valid, jnp.int32(5))
    assert isinstance(cc, QuantKVCache) and int(cc.length) == 7


def test_dense_cache_ops_still_dense():
    c = init_cache(2, 3, 4, 16, 8, jnp.float32)
    assert isinstance(rollback(c, 4), KVCache)
    assert isinstance(select_rows(c, jnp.array([0], jnp.int32)), KVCache)


# ------------------------------------------------------- engine integration
def test_speculative_engine_with_quantized_target():
    cfg = _tiny_cfg(num_layers=3)
    cfg_d = _tiny_cfg(num_layers=1)
    pt = llama.init_params(cfg, jax.random.key(0))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"], "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    qt = quantize_params(pt, "llama")
    bt = ModelBundle("llama", cfg, llama.forward, kv_quant=True)
    bd = ModelBundle("llama", cfg_d, llama.forward)
    prompt = list(range(5, 20))
    out = speculative_generate(
        bd, pd, bt, qt, prompt, 12, gamma=3, eos_token_id=-1,
        temperature=1.0, top_k=10, top_p=0.9, key=jax.random.key(7),
    )
    out = np.asarray(out)
    assert out.shape[0] == len(prompt) + 12
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_synthetic_pair_int8_generates_and_speculates():
    """The born-int8 pair (core/synthetic.py::synthetic_pair_int8, used by
    bench.py's 13B headline config) must produce valid quantized pytrees
    and run the speculative engine end-to-end at tiny dims."""
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair_int8
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate
    from llmspeculativesampling_tpu.quant.core import is_quantized_leaf

    bd, pd, bt, pt = synthetic_pair_int8(
        hidden_size=64, intermediate_size=128, num_layers=3, num_heads=2,
        vocab_size=256, draft_layers=1, max_position=256,
    )
    assert is_quantized_leaf(pt["layers"]["wq"])
    assert pt["layers"]["wq"]["q"].dtype == jnp.int8
    assert pt["layers"]["wq"]["q"].shape == (3, 64, 64)
    assert is_quantized_leaf(pt["lm_head"]) and pt["lm_head"]["q"].shape == (64, 256)
    assert pd["layers"]["wq"]["q"].shape == (1, 64, 64)
    # deeper target layers damped through scales
    assert float(pt["layers"]["wo"]["s"][2].mean()) < float(
        pt["layers"]["wo"]["s"][0].mean()) * 0.1

    out, details = speculative_generate(
        bd, pd, bt, pt, list(range(5, 20)), 12, gamma=3,
        key=jax.random.key(0), details=True, eos_token_id=-1,
        temperature=1.0, top_k=20, top_p=0.9,
    )
    assert len(out) >= 15 + 12
    assert 0.0 <= details["acc_rate"] <= 1.0


def test_synthetic_pair_fp8_generates_and_speculates():
    """Born-fp8 pair (fmt='fp8_e4m3', same codes as the int8 pair cast
    inside the generation jit — scripts/exp_fp8_bench.py's subject):
    valid f8 pytrees, working engine."""
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair_int8

    bd, pd, bt, pt = synthetic_pair_int8(
        hidden_size=64, intermediate_size=128, num_layers=3, num_heads=2,
        vocab_size=256, draft_layers=1, max_position=256, fmt="fp8_e4m3",
    )
    assert pt["layers"]["wq"]["q"].dtype == jnp.float8_e4m3fn
    assert pt["lm_head"]["q"].dtype == jnp.float8_e4m3fn
    out, details = speculative_generate(
        bd, pd, bt, pt, list(range(5, 20)), 12, gamma=3,
        key=jax.random.key(0), details=True, eos_token_id=-1,
        temperature=1.0, top_k=20, top_p=0.9,
    )
    assert len(out) >= 15 + 12
    assert 0.0 <= details["acc_rate"] <= 1.0


def test_small_draft_pair_embeds_draft_exactly():
    """synthetic_pair_int8_small_draft embeds the standalone narrow draft
    in the target's first layers via block-structured int8 weights; at
    damp=0 the target's output distribution must equal the draft's up to
    bf16 noise (the construction's exactness property — see the width-
    corrected RMSNorm analysis in core/synthetic.py)."""
    from llmspeculativesampling_tpu.cache.kvcache import init_cache
    from llmspeculativesampling_tpu.core.synthetic import (
        synthetic_pair_int8_small_draft,
    )

    bd, pd, bt, pt = synthetic_pair_int8_small_draft(
        hidden_size=256, intermediate_size=512, num_layers=4, num_heads=4,
        vocab_size=128, draft_hidden=128, draft_intermediate=256,
        draft_layers=2, damp=0.0,
    )
    assert bd.cfg.hidden_size == 128 and bt.cfg.hidden_size == 256
    assert bd.cfg.head_dim == bt.cfg.head_dim  # RoPE equivalence requires it

    toks = jnp.arange(3, 13)[None]
    cd = init_cache(bd.cfg.num_layers, 1, bd.cfg.num_kv_heads, 64, bd.cfg.head_dim)
    ct = init_cache(bt.cfg.num_layers, 1, bt.cfg.num_kv_heads, 64, bt.cfg.head_dim)
    ld, _ = bd.forward(pd, bd.cfg, toks, cd)
    lt, _ = bt.forward(pt, bt.cfg, toks, ct)
    p_d = jax.nn.softmax(ld[0, -1])
    p_t = jax.nn.softmax(lt[0, -1])
    assert float(jnp.max(jnp.abs(p_d - p_t))) < 5e-3

    # with damping the deeper layers perturb the target away from the draft
    _, _, bt2, pt2 = synthetic_pair_int8_small_draft(
        hidden_size=256, intermediate_size=512, num_layers=4, num_heads=4,
        vocab_size=128, draft_hidden=128, draft_intermediate=256,
        draft_layers=2, damp=0.05,
    )
    ct2 = init_cache(bt2.cfg.num_layers, 1, bt2.cfg.num_kv_heads, 64, bt2.cfg.head_dim)
    lt2, _ = bt2.forward(pt2, bt2.cfg, toks, ct2)
    assert float(jnp.max(jnp.abs(lt2 - lt))) > 1e-3


def test_opt_small_draft_pair_replicates_exactly():
    """synthetic_opt_pair_int8_small_draft carries the narrow draft's
    state replicated r times at 1/r scale — the construction that makes
    LayerNorm (mean subtraction + bias, which breaks the llama pair's
    zero-pad embedding) exactly replication-equivariant. At damp=0 the
    target's output distribution must equal the draft's up to bf16 noise;
    damping the deeper layers must then move the target."""
    from llmspeculativesampling_tpu.cache.kvcache import init_cache
    from llmspeculativesampling_tpu.core.synthetic import (
        synthetic_opt_pair_int8_small_draft,
    )

    kw = dict(hidden_size=64, ffn_dim=128, num_layers=4, num_heads=8,
              vocab_size=97, draft_hidden=16, draft_ffn=32, draft_layers=2,
              max_position=128)
    bd, pd, bt, pt = synthetic_opt_pair_int8_small_draft(damp=0.0, **kw)
    assert bd.cfg.hidden_size == 16 and bt.cfg.hidden_size == 64
    assert bd.cfg.head_dim == bt.cfg.head_dim  # head groups must repeat

    toks = jnp.arange(3, 13)[None]
    cd = init_cache(bd.cfg.num_layers, 1, bd.cfg.num_kv_heads, 64, bd.cfg.head_dim)
    ct = init_cache(bt.cfg.num_layers, 1, bt.cfg.num_kv_heads, 64, bt.cfg.head_dim)
    ld_, _ = bd.forward(pd, bd.cfg, toks, cd)
    lt, _ = bt.forward(pt, bt.cfg, toks, ct)
    p_d = jax.nn.softmax(ld_[0, -1])
    p_t = jax.nn.softmax(lt[0, -1])
    assert float(jnp.max(jnp.abs(p_d - p_t))) < 5e-3

    _, _, bt2, pt2 = synthetic_opt_pair_int8_small_draft(damp=0.05, **kw)
    ct2 = init_cache(bt2.cfg.num_layers, 1, bt2.cfg.num_kv_heads, 64, bt2.cfg.head_dim)
    lt2, _ = bt2.forward(pt2, bt2.cfg, toks, ct2)
    assert float(jnp.max(jnp.abs(lt2 - lt))) > 1e-3
