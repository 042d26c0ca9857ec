"""RoPE-scaling parity (VERDICT round-2 ask #2).

The reference supports linear and dynamic-NTK rotary scaling
(modeling_llama.py:128-160, selected from config at :263-283). Golden
tests: our JAX Llama with ``rope_scaling`` set must match an HF
``LlamaForCausalLM`` built with the same config — including the dynamic
branch past ``max_position_embeddings`` — and the loader must refuse
scaling types we do not implement.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.kvcache import init_cache
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.core.loader import (
    llama_config_from_hf,
    llama_params_from_state_dict,
    parse_rope_scaling,
)
from llmspeculativesampling_tpu.models import llama


def scaled_pair(rope_scaling, max_position=32, seed=0):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=max_position, rope_theta=10000.0,
        rms_norm_eps=1e-5,  # our LlamaConfig default; HF's default is 1e-6
        rope_scaling=dict(rope_scaling), tie_word_embeddings=False,
    )
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4,
        max_position=max_position, dtype="float32",
        rope_scaling=parse_rope_scaling(rope_scaling),
    )
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg, jnp.float32)
    return hf_model, cfg, params


def hf_logits(hf_model, tokens):
    with torch.no_grad():
        return hf_model(torch.tensor(tokens)).logits.float().numpy()


@pytest.mark.parametrize("seq", [16, 48])
def test_linear_scaling_full_forward(seq):
    """Linear scaling applies at every position (within and beyond the
    original max_position)."""
    hf_model, cfg, params = scaled_pair({"type": "linear", "factor": 2.0})
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, seq), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    ours, _ = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(ours), hf_logits(hf_model, tokens), atol=3e-4)


def test_linear_scaling_incremental_decode():
    hf_model, cfg, params = scaled_pair({"type": "linear", "factor": 4.0}, seed=1)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 12), dtype=np.int32)
    full = hf_logits(hf_model, tokens)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32, cfg.head_dim, jnp.float32)
    logits, cache = llama.forward(params, cfg, jnp.asarray(tokens[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, :6], atol=3e-4)
    for t in range(6, 12):
        logits, cache = llama.forward(params, cfg, jnp.asarray(tokens[:, t : t + 1]), cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t], atol=3e-4)


@pytest.mark.parametrize("seq", [16, 48])
def test_dynamic_ntk_full_forward(seq):
    """seq=16 stays below max_position (plain base); seq=48 exceeds it and
    engages the NTK-rescaled base
    theta * ((f*len/max) - (f-1)) ** (D/(D-2)) (modeling_llama.py:148-160)."""
    hf_model, cfg, params = scaled_pair({"type": "dynamic", "factor": 2.0})
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, seq), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    ours, _ = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    np.testing.assert_allclose(np.asarray(ours), hf_logits(hf_model, tokens), atol=3e-4)


def test_dynamic_ntk_actually_changes_logits():
    """Guard against the scaling silently not being threaded: past
    max_position the dynamic tables must differ from plain RoPE."""
    hf_model, cfg, params = scaled_pair({"type": "dynamic", "factor": 2.0}, seed=3)
    plain_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4,
        max_position=32, dtype="float32", rope_scaling=None,
    )
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 48), dtype=np.int32)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    scaled, _ = llama.forward(params, cfg, jnp.asarray(tokens), cache)
    cache2 = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim, jnp.float32)
    plain, _ = llama.forward(params, plain_cfg, jnp.asarray(tokens), cache2)
    assert float(np.abs(np.asarray(scaled) - np.asarray(plain)).max()) > 1e-3


# ------------------------------------------------------------- loader side

def test_loader_parses_linear_and_dynamic():
    assert parse_rope_scaling(None) is None
    assert parse_rope_scaling({"rope_type": "default"}) is None
    assert parse_rope_scaling({"type": "linear", "factor": 2.0}) == ("linear", 2.0)
    assert parse_rope_scaling({"rope_type": "dynamic", "factor": 8.0}) == ("dynamic", 8.0)


def test_loader_rejects_unknown_scaling():
    with pytest.raises(ValueError, match="rope_scaling"):
        parse_rope_scaling({"type": "yarn", "factor": 4.0})
    hf = {
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "rope_scaling": {"rope_type": "llama3", "factor": 8.0},
    }
    with pytest.raises(ValueError, match="rope_scaling"):
        llama_config_from_hf(hf)


def test_config_from_hf_threads_scaling():
    hf = {
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "rope_scaling": {"type": "linear", "factor": 2.0},
    }
    assert llama_config_from_hf(hf).rope_scaling == ("linear", 2.0)
