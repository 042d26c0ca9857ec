"""OPT model-core parity vs HF transformers (golden-logit tests).

Mirrors tests/test_llama_model.py for the second family; covers the
reference's OPT-specific patches: explicit position ids for tree nodes
(modeling_opt.py:109-124) and the +2 positional offset quirk.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import init_cache, rollback
from llmspeculativesampling_tpu.core.config import OPTConfig
from llmspeculativesampling_tpu.core.loader import opt_params_from_state_dict
from llmspeculativesampling_tpu.models import opt


def tiny_pair(word_embed_proj_dim=None, seed=0, vocab=128):
    from transformers import OPTConfig as HFOPTConfig, OPTForCausalLM

    torch.manual_seed(seed)
    hf_cfg = HFOPTConfig(
        vocab_size=vocab,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=128,
        do_layer_norm_before=True,
        word_embed_proj_dim=word_embed_proj_dim or 64,
        dropout=0.0,
        activation_function="relu",
    )
    hf_model = OPTForCausalLM(hf_cfg).eval()
    cfg = OPTConfig(
        vocab_size=vocab,
        hidden_size=64,
        ffn_dim=128,
        num_layers=3,
        num_heads=4,
        max_position=128,
        word_embed_proj_dim=word_embed_proj_dim,
        dtype="float32",
    )
    params = opt_params_from_state_dict(hf_model.state_dict(), cfg, jnp.float32)
    return hf_model, cfg, params


@pytest.fixture(scope="module")
def pair():
    return tiny_pair()


def hf_logits(hf_model, tokens):
    with torch.no_grad():
        return hf_model(torch.tensor(tokens)).logits.float().numpy()


def test_full_forward_parity(pair):
    hf_model, cfg, params = pair
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 11), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 2, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    logits, _ = opt.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(logits), hf_logits(hf_model, tokens), atol=2e-4)


def test_project_in_out_350m_style():
    hf_model, cfg, params = tiny_pair(word_embed_proj_dim=32, seed=3)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 7), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 16, cfg.head_dim, jnp.float32)
    logits, _ = opt.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(logits), hf_logits(hf_model, tokens), atol=2e-4)


def test_incremental_decode_matches_full(pair):
    hf_model, cfg, params = pair
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 10), dtype=np.int32)
    full = hf_logits(hf_model, tokens)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    logits, cache = opt.forward(params, cfg, jnp.asarray(tokens[:, :5]), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, :5], atol=2e-4)
    for t in range(5, 10):
        logits, cache = opt.forward(params, cfg, jnp.asarray(tokens[:, t : t + 1]), cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t], atol=2e-4)


def test_tree_mask_with_shared_positions(pair):
    """Two branch nodes share depth => same position id (the reason the
    reference patched OPT's positional embedding)."""
    hf_model, cfg, params = pair
    rng = np.random.default_rng(4)
    prefix = rng.integers(0, cfg.vocab_size, size=(1, 5), dtype=np.int32)
    nodes = rng.integers(0, cfg.vocab_size, size=3, dtype=np.int32)
    tree_mask = np.array([[[1, 0, 0], [1, 1, 0], [1, 0, 1]]], dtype=bool)
    positions = np.array([[5, 6, 6]], dtype=np.int32)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    _, cache = opt.forward(params, cfg, jnp.asarray(prefix), cache)
    tree_logits, _ = opt.forward(
        params, cfg, jnp.asarray(nodes[None]), cache,
        positions=jnp.asarray(positions), tree_mask=jnp.asarray(tree_mask),
    )
    tree_logits = np.asarray(tree_logits)
    for branch_node, col in ((nodes[1], 1), (nodes[2], 2)):
        seq = np.concatenate([prefix, [[nodes[0], branch_node]]], axis=1)
        ref = hf_logits(hf_model, seq)
        np.testing.assert_allclose(tree_logits[:, 0], ref[:, 5], atol=2e-4)
        np.testing.assert_allclose(tree_logits[:, col], ref[:, 6], atol=2e-4)


def test_opt_in_spec_engine(pair):
    """OPT works as both draft and target in the speculative engine."""
    _, cfg, params = pair
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate
    from llmspeculativesampling_tpu.engine.types import ModelBundle

    bundle = ModelBundle("opt", cfg, opt.forward)
    out, d = speculative_generate(
        bundle, params, bundle, params, [5, 17, 3, 22], 10,
        gamma=3, eos_token_id=127, top_k=10, key=jax.random.key(0), details=True,
    )
    assert d["resample_count"] == 0  # identical models accept everything
    assert len(out) >= 14
