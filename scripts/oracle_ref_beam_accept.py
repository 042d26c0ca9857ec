"""Oracle: run the REFERENCE beam_speculative_sampling_v2 with approx == target
(identical tiny Llama built from the reference's own forked modeling file,
/root/reference/sampling/models/modeling_llama.py) and report its beam-level
acceptance. Determines whether low beam-level acceptance is the reference's
own semantics or a bug in our TPU walk.

Measured result (2026-08-20, CPU torch):
    ref beam_v2 identical pair: acc_len mean 2.15, acc_rate mean 0.346
    ref spec    identical pair: acc_len mean 4.0,  acc_rate 1.0
Our TPU engine on an equivalent identical pair: acc_len 1.88, acc_rate 0.28
(same ballpark; different weights/RNG streams). Conclusion: beam_v2's
beam-level joint acceptance (speculative_sampling.py:277-303) is
intrinsically much stricter than token-level acceptance even with a perfect
draft — the low accepted-length is reference semantics, not a walk bug.
See docs/PERFORMANCE.md "Tree/beam engines".

Requires /root/reference on disk; NOT part of CI. Shims adapt the 4.35-era
reference to the installed transformers 4.57: top-level BeamSearchScorer
re-export, legacy _update_model_kwargs_for_generation (4.57's requires
cache_position), scalar StoppingCriteriaList, list-typed eos in finalize().
"""
import sys
import torch
import numpy as np

sys.path.insert(0, "/root/reference")
# the bloom deep import (kvcache_model.py:7) replaces
# sys.modules['transformers']; import it FIRST, then shim what survives.
import transformers.models.bloom.modeling_bloom  # noqa: F401
import transformers
from transformers.generation.beam_search import BeamSearchScorer, BeamScorer

transformers.BeamSearchScorer = BeamSearchScorer
transformers.BeamScorer = BeamScorer

from transformers.models.llama.configuration_llama import LlamaConfig

from sampling.models.modeling_llama import LlamaForCausalLM as RefLlama
from sampling import beam_speculative_sampling_v2, speculative_sampling


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

# 4.57 StoppingCriteriaList returns a per-batch bool tensor; 4.35 returned
# a scalar. Collapse it so `if stopping_criteria(...)` works again.
from transformers import StoppingCriteriaList

_orig_scl_call = StoppingCriteriaList.__call__


def _scalar_scl_call(self, input_ids, scores, **kw):
    out = _orig_scl_call(self, input_ids, scores, **kw)
    return bool(torch.as_tensor(out).all()) if torch.is_tensor(out) else out


StoppingCriteriaList.__call__ = _scalar_scl_call

# 4.57 finalize() indexes eos_token_id as a list; 4.35 accepted int/None.
_orig_finalize = BeamSearchScorer.finalize


def _compat_finalize(self, *args, **kw):
    eos = kw.get("eos_token_id")
    if eos is None:
        eos = [1]  # the oracle's eos id
    elif not isinstance(eos, (list, tuple)):
        eos = [eos]
    kw["eos_token_id"] = eos
    return _orig_finalize(self, *args, **kw)


BeamSearchScorer.finalize = _compat_finalize

torch.manual_seed(0)
cfg = LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=512,
)
from transformers import GenerationConfig
from transformers.generation import GenerationMixin


class OracleLlama(RefLlama, GenerationMixin):
    # 4.57 moved generation helpers (_expand_inputs_for_generation, ...)
    # off PreTrainedModel; mix them back in for the 4.35-era fork.
    pass


model = OracleLlama(cfg).eval()
model.generation_config = GenerationConfig(do_sample=True)

prefix = torch.tensor([np.random.default_rng(0).integers(5, 250, 16)],
                      dtype=torch.long)

out, d = beam_speculative_sampling_v2(
    prefix, model, model, eos_token_id=1, pad_token_id=1, max_len=48,
    gamma=4, width=4, num_beams=4, extra_sample_cnt=1, expect_thres=0.7,
    temperature=1.0, top_k=20, top_p=0.9, details=True)
print("ref beam_v2 identical pair:")
print("  acc_len", d["acc_len"], "mean", float(np.mean(d["acc_len"])))
print("  acc_rate mean", float(np.mean(d["acc_rate"])) if d["acc_rate"] else None)

out, d = speculative_sampling(
    prefix, model, model, eos_token_id=1, pad_token_id=1, max_len=48, gamma=4,
    temperature=1.0, top_k=20, top_p=0.9, details=True)
print("ref spec identical pair: mean acc_len",
      float(np.mean(d["acc_len"])), "acc_rate", float(np.mean(d["acc_rate"])))
