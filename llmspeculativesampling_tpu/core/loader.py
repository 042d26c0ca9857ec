"""HF checkpoint -> JAX param pytree conversion (checkpoint subsystem).

The reference relies on ``from_pretrained`` + ``device_map='auto'``
(/root/reference/evaluation.py:183-253). Here: read a local HF directory
(config.json + *.safetensors) or an in-memory state dict, transpose Linear
weights from [out, in] to [in, out], and stack per-layer tensors on a
leading L axis for the ``lax.scan`` decoder bodies.

No network access is assumed or performed (checkpoints must be local).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from .config import LlamaConfig, OPTConfig


def _to_numpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (tests) — duck-typed so torch stays optional
    detach = getattr(x, "detach", None)
    if detach is not None:
        t = x.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(x)


def parse_rope_scaling(rs) -> tuple | None:
    """HF ``rope_scaling`` dict -> our ("linear"|"dynamic", factor) tuple.

    Only the two variants the reference implements
    (modeling_llama.py:128-160,263-283) are supported; anything else
    (yarn, llama3, longrope, ...) raises instead of silently loading a
    checkpoint whose logits would be wrong."""
    if rs is None:
        return None
    kind = rs.get("rope_type", rs.get("type"))
    if kind in (None, "default"):
        return None
    if kind not in ("linear", "dynamic"):
        raise ValueError(
            f"unsupported rope_scaling type {kind!r}: only 'linear' and "
            "'dynamic' (NTK) are implemented (reference "
            "modeling_llama.py:263-283); refusing to load the checkpoint "
            "with wrong rotary embeddings"
        )
    return (kind, float(rs["factor"]))


def llama_config_from_hf(hf: Mapping) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        max_position=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=parse_rope_scaling(hf.get("rope_scaling")),
        tie_embeddings=hf.get("tie_word_embeddings", False),
    )


def opt_config_from_hf(hf: Mapping) -> OPTConfig:
    return OPTConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        ffn_dim=hf["ffn_dim"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        max_position=hf.get("max_position_embeddings", 2048),
        word_embed_proj_dim=(
            hf.get("word_embed_proj_dim")
            if hf.get("word_embed_proj_dim") not in (None, hf["hidden_size"])
            else None
        ),
        do_layer_norm_before=hf.get("do_layer_norm_before", True),
    )


def llama_params_from_state_dict(sd: Mapping, cfg: LlamaConfig, dtype=None) -> Dict:
    """Map HF Llama names -> our pytree. Accepts torch tensors or numpy."""
    dt = dtype or cfg.jnp_dtype
    g = lambda name: _to_numpy(sd[name])

    def stack(fmt: str, transpose: bool):
        mats = [g(fmt.format(i)) for i in range(cfg.num_layers)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out, dt)

    layers = {
        "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
        "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
        "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
        "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
        "w_gate": stack("model.layers.{}.mlp.gate_proj.weight", True),
        "w_up": stack("model.layers.{}.mlp.up_proj.weight", True),
        "w_down": stack("model.layers.{}.mlp.down_proj.weight", True),
        "ln_attn": stack("model.layers.{}.input_layernorm.weight", False),
        "ln_mlp": stack("model.layers.{}.post_attention_layernorm.weight", False),
    }
    if cfg.qkv_bias:  # Qwen2 variant
        layers["bq"] = stack("model.layers.{}.self_attn.q_proj.bias", False)
        layers["bk"] = stack("model.layers.{}.self_attn.k_proj.bias", False)
        layers["bv"] = stack("model.layers.{}.self_attn.v_proj.bias", False)
    params = {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dt),
        "layers": layers,
        "ln_final": jnp.asarray(g("model.norm.weight"), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(g("lm_head.weight"), dt)
    return params


def opt_params_from_state_dict(sd: Mapping, cfg: OPTConfig, dtype=None) -> Dict:
    """Map HF OPT names -> our pytree (see models/opt.py for layout)."""
    dt = dtype or cfg.jnp_dtype
    pre = "model.decoder."
    g = lambda name: _to_numpy(sd[pre + name])

    def stack(fmt: str, transpose: bool):
        mats = [g(fmt.format(i)) for i in range(cfg.num_layers)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out, dt)

    layers = {
        "wq": stack("layers.{}.self_attn.q_proj.weight", True),
        "bq": stack("layers.{}.self_attn.q_proj.bias", False),
        "wk": stack("layers.{}.self_attn.k_proj.weight", True),
        "bk": stack("layers.{}.self_attn.k_proj.bias", False),
        "wv": stack("layers.{}.self_attn.v_proj.weight", True),
        "bv": stack("layers.{}.self_attn.v_proj.bias", False),
        "wo": stack("layers.{}.self_attn.out_proj.weight", True),
        "bo": stack("layers.{}.self_attn.out_proj.bias", False),
        "ln_attn_w": stack("layers.{}.self_attn_layer_norm.weight", False),
        "ln_attn_b": stack("layers.{}.self_attn_layer_norm.bias", False),
        "fc1_w": stack("layers.{}.fc1.weight", True),
        "fc1_b": stack("layers.{}.fc1.bias", False),
        "fc2_w": stack("layers.{}.fc2.weight", True),
        "fc2_b": stack("layers.{}.fc2.bias", False),
        "ln_mlp_w": stack("layers.{}.final_layer_norm.weight", False),
        "ln_mlp_b": stack("layers.{}.final_layer_norm.bias", False),
    }
    params = {
        "embed": jnp.asarray(g("embed_tokens.weight"), dt),
        "embed_pos": jnp.asarray(g("embed_positions.weight"), dt),
        "layers": layers,
    }
    if "model.decoder.final_layer_norm.weight" in sd:
        params["ln_final_w"] = jnp.asarray(g("final_layer_norm.weight"), dt)
        params["ln_final_b"] = jnp.asarray(g("final_layer_norm.bias"), dt)
    if "model.decoder.project_in.weight" in sd:
        params["project_in"] = jnp.asarray(g("project_in.weight").T, dt)
        params["project_out"] = jnp.asarray(g("project_out.weight").T, dt)
    # OPT ties lm_head to embed_tokens; keep a separate head only if present.
    if "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_to_numpy(sd["lm_head.weight"]), dt)
    return params


def _read_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open  # transformers dependency, local only

    sd: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    return sd


def load_pretrained(path: str, dtype: str = "bfloat16", cache_dir: str = None):
    """Load a local HF checkpoint dir -> (family, cfg, params).

    Family selection mirrors the reference harness: 'llama' in name ->
    Llama, 'opt' -> OPT (evaluation.py:183-253), here decided by
    config.json's model_type.

    ``cache_dir``: one-time conversion cache (SURVEY.md §5 checkpoint
    note). First load converts safetensors -> pytree and saves an orbax
    checkpoint there; subsequent loads restore it directly (no transpose /
    stack / host round-trip). The reference re-runs ``from_pretrained``
    every process (evaluation.py:183-253).
    """
    if cache_dir and os.path.exists(os.path.join(cache_dir, "meta.json")):
        return load_params(cache_dir)
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    sd = _read_safetensors_dir(path)
    model_type = hf.get("model_type", "")
    if model_type in ("llama", "qwen2", "mistral"):
        # qwen2/mistral are architecturally the llama decoder: qwen2 adds
        # qkv biases (HF Qwen2Attention hardcodes them); mistral's only
        # delta is sliding-window attention, a no-op at windows >= the
        # context we serve — reject configs where it would truncate.
        cfg = llama_config_from_hf(hf)
        max_pos = cfg.max_position
        window = None
        if model_type == "mistral":
            window = hf.get("sliding_window")
        elif model_type == "qwen2" and hf.get("use_sliding_window"):
            window = hf.get("sliding_window")
        if window is not None and window < max_pos:
            max_pos = window
        cfg = LlamaConfig(**{
            **cfg.__dict__, "dtype": dtype, "max_position": max_pos,
            "qkv_bias": model_type == "qwen2",
            "sliding_window": window,
        })
        out = "llama", cfg, llama_params_from_state_dict(sd, cfg)
    elif model_type == "opt":
        cfg = opt_config_from_hf(hf)
        cfg = OPTConfig(**{**cfg.__dict__, "dtype": dtype})
        out = "opt", cfg, opt_params_from_state_dict(sd, cfg)
    else:
        raise ValueError(f"unsupported model_type {model_type!r} at {path}")
    if cache_dir:
        save_params(cache_dir, *out)
    return out


# ---------------------------------------------------------------- checkpoint
# Orbax-backed param checkpointing: used for the HF-conversion cache and for
# persisting quantized weights (quantize once, serve many). The param pytree
# (including int8 {"q","s"} leaves) round-trips as-is.


def save_params(ckpt_dir: str, family: str, cfg, params) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "params"), params, force=True)
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"family": family, "cfg": cfg.__dict__}, f)


def load_params(ckpt_dir: str):
    """Restore (family, cfg, params) written by :func:`save_params`."""
    import jax
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    family = meta["family"]
    cfg = (LlamaConfig if family == "llama" else OPTConfig)(**meta["cfg"])
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(ckpt_dir, "params"))
    params = jax.tree.map(jnp.asarray, params)
    return family, cfg, params
