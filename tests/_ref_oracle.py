"""Reference-code-in-the-loop oracle for the differential CI suite.

Promotes the transformers-4.57 compatibility shims proven in
``scripts/oracle_ref_beam_accept.py`` into an importable fixture layer so
pytest can execute the reference's OWN torch implementations
(``/root/reference/sampling/``) on tiny Llamas whose weights are shared
bit-for-bit with our JAX engines (via
``core/loader.py::llama_params_from_state_dict``).  Tests built on this
module compare our engines against the reference *code*, not against
NumPy re-derivations of its rules (VERDICT round-2 ask #1).

Shim inventory (process-global, applied once, idempotent):
  * ``/root/reference`` on ``sys.path``;
    ``transformers.models.bloom.modeling_bloom`` imported FIRST — the
    reference's ``kvcache_model.py:7`` deep import replaces
    ``sys.modules['transformers']``, so everything else must shim AFTER.
  * ``transformers.BeamSearchScorer`` / ``BeamScorer`` re-exported at the
    4.35-era top level the fork imports from.
  * legacy ``_update_model_kwargs_for_generation`` installed on the forked
    ``LlamaForCausalLM`` (4.57's version requires ``cache_position``).
  * ``StoppingCriteriaList.__call__`` collapsed to a scalar bool
    (4.35 semantics; 4.57 returns a per-batch tensor).
  * ``BeamSearchScorer.finalize`` eos listified (4.57 indexes it).
  * ``GenerationMixin`` mixed into the forked model class (4.57 moved
    ``_expand_inputs_for_generation`` etc. off ``PreTrainedModel``).

The shims mutate installed-transformers classes; they only alter
generation-utility behavior no other test in this suite exercises.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

import jax.numpy as jnp

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.core.loader import llama_params_from_state_dict
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama

REFERENCE_ROOT = "/root/reference"

_STATE = {}


def reference():
    """Return the shimmed reference ``sampling`` package (cached)."""
    if "sampling" in _STATE:
        return _STATE["sampling"]
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "sampling")):
        raise RuntimeError(f"reference checkout not found at {REFERENCE_ROOT}")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # Deep import FIRST: replaces sys.modules['transformers'] (see module doc).
    import transformers.models.bloom.modeling_bloom  # noqa: F401
    import transformers
    from transformers.generation.beam_search import BeamSearchScorer, BeamScorer

    transformers.BeamSearchScorer = BeamSearchScorer
    transformers.BeamScorer = BeamScorer

    from sampling.models.modeling_llama import LlamaForCausalLM as RefLlama
    import sampling

    def legacy_update_model_kwargs(self, outputs, model_kwargs,
                                   is_encoder_decoder=False, **kw):
        # 4.35 semantics: carry the cache forward, grow the attention mask.
        if hasattr(outputs, "past_key_values"):
            model_kwargs["past_key_values"] = outputs.past_key_values
        if not is_encoder_decoder and "attention_mask" in model_kwargs:
            am = model_kwargs["attention_mask"]
            model_kwargs["attention_mask"] = torch.cat(
                [am, am.new_ones((am.shape[0], 1))], dim=-1)
        return model_kwargs

    RefLlama._update_model_kwargs_for_generation = legacy_update_model_kwargs

    from transformers import StoppingCriteriaList

    orig_scl_call = StoppingCriteriaList.__call__

    def scalar_scl_call(self, input_ids, scores, **kw):
        out = orig_scl_call(self, input_ids, scores, **kw)
        return bool(torch.as_tensor(out).all()) if torch.is_tensor(out) else out

    StoppingCriteriaList.__call__ = scalar_scl_call

    orig_finalize = BeamSearchScorer.finalize

    def compat_finalize(self, *args, **kw):
        eos = kw.get("eos_token_id")
        if eos is None:
            eos = [EOS]
        elif not isinstance(eos, (list, tuple)):
            eos = [eos]
        kw["eos_token_id"] = eos
        return orig_finalize(self, *args, **kw)

    BeamSearchScorer.finalize = compat_finalize

    from transformers import GenerationConfig
    from transformers.generation import GenerationMixin

    class OracleLlama(RefLlama, GenerationMixin):
        """4.35-era fork + 4.57 generation helpers mixed back in."""

    _STATE["sampling"] = sampling
    _STATE["OracleLlama"] = OracleLlama
    _STATE["GenerationConfig"] = GenerationConfig
    return sampling


# Tiny-model geometry shared by every differential test.
VOCAB = 256
HIDDEN = 64
HEADS = 4
EOS = 1
PREFIX = np.random.default_rng(0).integers(5, 250, 16).tolist()


def make_torch_llama(num_layers: int, seed: int):
    """A tiny reference-fork Llama with deterministic weights."""
    reference()
    from transformers.models.llama.configuration_llama import LlamaConfig as HFCfg

    torch.manual_seed(seed)
    cfg = HFCfg(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=2 * HIDDEN,
        num_hidden_layers=num_layers, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    model = _STATE["OracleLlama"](cfg).eval()
    model.generation_config = _STATE["GenerationConfig"](do_sample=True)
    return model


def to_jax(torch_model, num_layers: int):
    """Convert a tiny torch fork model's weights into (bundle, params)."""
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=2 * HIDDEN,
        num_layers=num_layers, num_heads=HEADS, num_kv_heads=HEADS,
        max_position=512, dtype="float32",
    )
    params = llama_params_from_state_dict(
        torch_model.state_dict(), cfg, jnp.float32)
    return ModelBundle(family="llama", cfg=cfg, forward=llama.forward), params


def shared_models():
    """(torch_draft, torch_target, bundle_d, params_d, bundle_t, params_t)
    — one weight set, two frameworks. Cached per process.

    The draft is the target perturbed with small Gaussian noise rather
    than an independent random net: two independent tiny random models
    disagree so much that acceptance is ~0 and the acc_len/acc_rate
    profiles carry no signal; a perturbed copy puts acceptance mid-range
    where a walk bug in either framework would actually move the numbers."""
    if "models" not in _STATE:
        tt = make_torch_llama(3, seed=0)
        td = make_torch_llama(3, seed=0)  # identical init...
        gen = torch.Generator().manual_seed(7)
        with torch.no_grad():
            for p in td.parameters():  # ...plus per-tensor relative noise
                p.add_(torch.randn(p.shape, generator=gen) * 0.25 * p.std())
        bd, pd = to_jax(td, 3)
        bt, pt = to_jax(tt, 3)
        _STATE["models"] = (td, tt, bd, pd, bt, pt)
    return _STATE["models"]


def make_torch_opt(num_layers: int, seed: int):
    """A tiny reference-fork OPT (modeling_opt.py — the explicit-positions
    patch, :109-124) with deterministic weights."""
    reference()
    from transformers.models.opt.configuration_opt import OPTConfig as HFCfg
    from sampling.models.modeling_opt import OPTForCausalLM as RefOPT
    from transformers import GenerationConfig
    from transformers.generation import GenerationMixin

    if "OracleOPT" not in _STATE:
        class OracleOPT(RefOPT, GenerationMixin):
            """4.35-era fork + 4.57 generation helpers mixed back in."""

        _STATE["OracleOPT"] = OracleOPT

    torch.manual_seed(seed)
    cfg = HFCfg(
        vocab_size=VOCAB, hidden_size=HIDDEN, ffn_dim=2 * HIDDEN,
        num_hidden_layers=num_layers, num_attention_heads=HEADS,
        max_position_embeddings=128, word_embed_proj_dim=HIDDEN,
        do_layer_norm_before=True,
    )
    model = _STATE["OracleOPT"](cfg).eval()
    model.generation_config = GenerationConfig(do_sample=True)
    return model


def opt_to_jax(torch_model, num_layers: int):
    from llmspeculativesampling_tpu.core.config import OPTConfig
    from llmspeculativesampling_tpu.core.loader import opt_params_from_state_dict
    from llmspeculativesampling_tpu.models import opt

    cfg = OPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, ffn_dim=2 * HIDDEN,
        num_layers=num_layers, num_heads=HEADS, max_position=128,
        dtype="float32",
    )
    params = opt_params_from_state_dict(torch_model.state_dict(), cfg, jnp.float32)
    return ModelBundle(family="opt", cfg=cfg, forward=opt.forward), params


def shared_opt_models():
    """OPT-family analogue of :func:`shared_models` (perturbed-copy
    draft); proves the OPT MODEL core inside the reference's own loops."""
    if "opt_models" not in _STATE:
        tt = make_torch_opt(3, seed=2)
        td = make_torch_opt(3, seed=2)
        gen = torch.Generator().manual_seed(13)
        with torch.no_grad():
            for p in td.parameters():
                p.add_(torch.randn(p.shape, generator=gen) * 0.25 * p.std())
        bd, pd = opt_to_jax(td, 3)
        bt, pt = opt_to_jax(tt, 3)
        _STATE["opt_models"] = (td, tt, bd, pd, bt, pt)
    return _STATE["opt_models"]


def tv_distance(samples_a, samples_b, support: int = VOCAB) -> float:
    """Total-variation distance between two empirical token histograms."""
    ha = np.bincount(np.asarray(samples_a), minlength=support).astype(np.float64)
    hb = np.bincount(np.asarray(samples_b), minlength=support).astype(np.float64)
    return 0.5 * np.abs(ha / ha.sum() - hb / hb.sum()).sum()


def prefix_tensor() -> torch.Tensor:
    return torch.tensor([PREFIX], dtype=torch.long)
