"""Checkpoint (orbax param cache) and profiling-sidecar tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.core.loader import load_params, save_params
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.quant.core import quantize_params
from llmspeculativesampling_tpu.utils.profiling import PhaseTimer, benchmark


def _small_cfg():
    return LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position=64, dtype="float32",
    )


def test_save_load_roundtrip(tmp_path):
    cfg = _small_cfg()
    params = llama.init_params(cfg, jax.random.key(0))
    d = str(tmp_path / "ckpt")
    save_params(d, "llama", cfg, params)
    fam, cfg2, p2 = load_params(d)
    assert fam == "llama" and cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_quantized(tmp_path):
    cfg = _small_cfg()
    params = quantize_params(
        llama.init_params(cfg, jax.random.key(0)), "llama", quantize_lm_head=True
    )
    d = str(tmp_path / "ckpt_q")
    save_params(d, "llama", cfg, params)
    _, _, p2 = load_params(d)
    assert p2["layers"]["wq"]["q"].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wq"]["q"]), np.asarray(p2["layers"]["wq"]["q"])
    )
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]["s"]), np.asarray(p2["lm_head"]["s"])
    )


def test_save_load_fp8(tmp_path):
    """fp8 e4m3 weight checkpoints persist bit-exactly (r5: the second
    weight format, quant/core.py fmt='fp8_e4m3')."""
    cfg = _small_cfg()
    params = quantize_params(
        llama.init_params(cfg, jax.random.key(0)), "llama",
        quantize_lm_head=True, fmt="fp8_e4m3",
    )
    d = str(tmp_path / "ckpt_f8")
    save_params(d, "llama", cfg, params)
    _, _, p2 = load_params(d)
    assert p2["layers"]["wq"]["q"].dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wq"]["q"]).view(np.uint8),
        np.asarray(p2["layers"]["wq"]["q"]).view(np.uint8),
    )


def test_load_pretrained_cache(tmp_path, monkeypatch):
    """load_pretrained(cache_dir=...) converts once, restores after."""
    from llmspeculativesampling_tpu.core import loader

    cfg = _small_cfg()
    params = llama.init_params(cfg, jax.random.key(1))
    cache = str(tmp_path / "conv")
    save_params(cache, "llama", cfg, params)  # simulate a prior conversion
    calls = {"n": 0}
    monkeypatch.setattr(loader, "_read_safetensors_dir",
                        lambda p: calls.__setitem__("n", calls["n"] + 1) or {})
    fam, cfg2, p2 = loader.load_pretrained("/nonexistent", cache_dir=cache)
    assert fam == "llama" and calls["n"] == 0  # cache hit, no safetensors read
    np.testing.assert_array_equal(
        np.asarray(params["embed"]), np.asarray(p2["embed"])
    )


def test_benchmark_and_phase_timer(tmp_path):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        jnp.asarray(np.zeros(4)).block_until_ready()

    out = benchmark(fn, repeats=3, warmup=1, tokens_per_call=10,
                    trace_dir=str(tmp_path / "trace"))
    assert calls["n"] == 4 and out["repeats"] == 3
    assert out["tokens_per_s"] > 0
    assert os.path.isdir(str(tmp_path / "trace"))

    pt = PhaseTimer()
    with pt.phase("draft"):
        pass
    with pt.phase("draft"):
        pass
    with pt.phase("verify"):
        pass
    d = pt.as_dict()
    assert set(d) == {"draft", "verify"} and d["draft"] >= 0
