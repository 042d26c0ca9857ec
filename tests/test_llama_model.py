"""Llama model-core parity vs HF transformers (golden-logit tests).

This is the SURVEY.md §4(e) strategy: the reference trusts HF's modeling
code; we check our from-scratch JAX decoder produces the same logits as a
randomly-initialized HF ``LlamaForCausalLM`` on CPU, including incremental
decoding over the static KV cache, rollback, and tree-attention masks
(reference forked-model behavior, modeling_llama.py:684-689).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import init_cache, rollback
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.core.loader import llama_params_from_state_dict
from llmspeculativesampling_tpu.models import llama


def tiny_pair(num_kv_heads=4, vocab=128, seed=0):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=vocab,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=64,
        intermediate_size=128,
        num_layers=3,
        num_heads=4,
        num_kv_heads=num_kv_heads,
        max_position=256,
        dtype="float32",
    )
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg, jnp.float32)
    return hf_model, cfg, params


@pytest.fixture(scope="module")
def pair():
    return tiny_pair()


@pytest.fixture(scope="module")
def gqa_pair():
    return tiny_pair(num_kv_heads=2, seed=1)


def hf_logits(hf_model, tokens: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return hf_model(torch.tensor(tokens)).logits.float().numpy()


def test_full_forward_parity(pair):
    hf_model, cfg, params = pair
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 2, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(logits), hf_logits(hf_model, tokens), atol=2e-4)


def test_gqa_forward_parity(gqa_pair):
    hf_model, cfg, params = gqa_pair
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 9), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 16, cfg.head_dim, jnp.float32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(logits), hf_logits(hf_model, tokens), atol=2e-4)


def test_incremental_decode_matches_full(pair):
    hf_model, cfg, params = pair
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 10), dtype=np.int32)
    full = hf_logits(hf_model, tokens)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    # prefill on the first 6, then one token at a time
    logits, cache = llama.forward(params, cfg, jnp.asarray(tokens[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, :6], atol=2e-4)
    for t in range(6, 10):
        logits, cache = llama.forward(params, cfg, jnp.asarray(tokens[:, t : t + 1]), cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t], atol=2e-4)


def test_rollback_reexecute_equals_fresh(pair):
    """KV rollback equivalence (SURVEY.md §4(c)): decode, roll back, redo."""
    hf_model, cfg, params = pair
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 8), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    _, cache = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    assert int(cache.length) == 8

    cache = rollback(cache, 5)
    alt = rng.integers(0, cfg.vocab_size, size=(1, 3), dtype=np.int32)
    logits_rb, cache = llama.forward(params, cfg, jnp.asarray(alt), cache)
    assert int(cache.length) == 8

    fresh_tokens = np.concatenate([tokens[:, :5], alt], axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_rb), hf_logits(hf_model, fresh_tokens)[:, 5:], atol=2e-4
    )


def test_tree_mask_matches_linear_paths(pair):
    """Tree attention: two branches verified in one forward must reproduce
    the logits of each branch run as a plain causal sequence
    (reference differential check, speculative_sampling.py:145-164)."""
    hf_model, cfg, params = pair
    rng = np.random.default_rng(4)
    prefix = rng.integers(0, cfg.vocab_size, size=(1, 5), dtype=np.int32)
    # tree: node0 -> node1 (branch A), node0 -> node2 (branch B)
    nodes = rng.integers(0, cfg.vocab_size, size=3, dtype=np.int32)
    tree_mask = np.array(
        [[[1, 0, 0], [1, 1, 0], [1, 0, 1]]], dtype=bool
    )
    positions = np.array([[5, 6, 6]], dtype=np.int32)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    _, cache = llama.forward(params, cfg, jnp.asarray(prefix), cache)
    tree_logits, _ = llama.forward(
        params, cfg, jnp.asarray(nodes[None]), cache,
        positions=jnp.asarray(positions), tree_mask=jnp.asarray(tree_mask),
    )
    tree_logits = np.asarray(tree_logits)

    for branch_node, tree_col in ((nodes[1], 1), (nodes[2], 2)):
        seq = np.concatenate([prefix, [[nodes[0], branch_node]]], axis=1)
        ref = hf_logits(hf_model, seq)
        np.testing.assert_allclose(tree_logits[:, 0], ref[:, 5], atol=2e-4)
        np.testing.assert_allclose(tree_logits[:, tree_col], ref[:, 6], atol=2e-4)


def test_jit_decode_step_no_recompile(pair):
    """The step must compile once: same shapes at every length."""
    _, cfg, params = pair
    step = jax.jit(lambda p, t, c: llama.forward(p, cfg, t, c))
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    tok = jnp.ones((1, 1), jnp.int32)
    _, cache = step(params, tok, cache)
    compiles_before = step._cache_size()
    for _ in range(5):
        _, cache = step(params, tok, cache)
    assert step._cache_size() == compiles_before == 1
