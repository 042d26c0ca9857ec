"""Random-width beam *sampling* with the target model only (L3).

Capability parity: reference ``random_width_beam_sampling``
(/root/reference/sampling/autoregressive_sampling.py:63-207): each step
samples a random number of beams in [min_num_beams, max_num_beams] (:136)
from the joint beam x vocab distribution
``norm_logits(log_softmax(logits) + beam_scores)`` (:123-132), reorders the
KV cache by parent (:150-155), collects EOS-terminated rows as candidates
with length-normalized scores and kills them with -inf (:180-187), stops
when every beam is dead (:186), and returns the best-scoring candidate
(:189-199).

TPU design: a fixed ``max_num_beams``-row state; the dynamic width k is
realized by drawing a full without-replacement Gumbel ordering and masking
rows >= k to -inf (the first k draws of a Gumbel ordering are exactly a
k-sample without replacement, and -inf rows can never be re-sampled) — the
same trick the reference uses for its -inf padding rows. One jitted
while_loop; the candidate set is a running arg-max instead of a host list.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..cache.kvcache import rollback, select_rows
from ..ops.sampling import (
    SamplingConfig,
    joint_topk_from_logp,
    norm_logits,
    prob_of_topk,
    sample_k,
    sample_k_topk,
    use_sparse,
)
from .types import aligned_total, ModelBundle, pad_prompt

_DEAD = -1e30
_DONE_THRES = -10000.0


@partial(
    jax.jit,
    static_argnames=(
        "bundle", "max_num_beams", "min_num_beams", "max_new_tokens", "scfg",
        "eos_token_id", "max_total_len",
    ),
)
def _random_beam_device(
    params,
    prompt_padded,
    prompt_len,
    key,
    *,
    bundle: ModelBundle,
    max_num_beams: int,
    min_num_beams: int,
    max_new_tokens: int,
    scfg: SamplingConfig,
    eos_token_id: int,
    max_total_len: int,
):
    cfg = bundle.cfg
    kmax = max_num_beams
    vocab = cfg.vocab_size
    cache = bundle.make_cache(kmax, max_total_len)

    row_tokens = jnp.broadcast_to(prompt_padded, (kmax, prompt_padded.shape[1]))
    row_tokens = jnp.concatenate(
        [row_tokens, jnp.zeros((kmax, max_total_len - prompt_padded.shape[1]), jnp.int32)], axis=1
    )
    logits, cache = bundle.forward(params, cfg, row_tokens[:, : prompt_padded.shape[1]], cache)
    cache = rollback(cache, prompt_len)
    last_logits = jax.lax.dynamic_slice(logits, (0, prompt_len - 1, 0), (kmax, 1, vocab))[:, 0]

    total = prompt_len + max_new_tokens
    beam_scores = jnp.zeros((kmax,), jnp.float32)

    def cond(s):
        cur_len, beam_scores = s[1], s[4]
        return jnp.logical_and(cur_len < total, jnp.max(beam_scores) >= _DONE_THRES)

    def body(s):
        (row_tokens, cur_len, cache, last_logits, beam_scores, key,
         best_tokens, best_score, best_len) = s

        token_logp = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)

        key, kw, ks = jax.random.split(key, 3)
        k_width = jax.random.randint(kw, (), min_num_beams, max_num_beams + 1)
        if use_sparse(scfg):
            # candidate-space joint (ops/sampling.py sparse-joint rationale):
            # per-row top-k + merge instead of a [K*V] softmax/sort
            d = joint_topk_from_logp(token_logp, beam_scores, scfg)
            t = sample_k_topk(ks, d, kmax)  # full Gumbel ordering draw
            t_prob = prob_of_topk(d, t)
        else:
            joint = token_logp + beam_scores[:, None]
            last_p = norm_logits(joint.reshape(1, -1), scfg)[0]  # [K*V]
            t = sample_k(ks, last_p[None], kmax)[0]
            t_prob = last_p[t]
        parent = t // vocab
        token = t % vocab
        active = jnp.arange(kmax) < k_width
        new_scores = jnp.where(active, jnp.log(t_prob + 1e-30), _DEAD)

        cache = select_rows(cache, parent)
        row_tokens = row_tokens[parent]
        row_tokens = jax.lax.dynamic_update_slice(
            row_tokens, token[:, None], (jnp.zeros((), jnp.int32), cur_len)
        )
        cur_len = cur_len + 1

        # EOS handling (:180-187): finished rows -> candidates, then killed
        finished = active & (token == eos_token_id)
        norm = new_scores / jnp.maximum(cur_len - prompt_len, 1).astype(jnp.float32)
        cand_score = jnp.where(finished, norm, _DEAD)
        cbest = jnp.argmax(cand_score)
        improved = cand_score[cbest] > best_score
        best_tokens = jnp.where(improved, row_tokens[cbest], best_tokens)
        best_score = jnp.where(improved, cand_score[cbest], best_score)
        best_len = jnp.where(improved, cur_len, best_len)
        new_scores = jnp.where(finished, _DEAD, new_scores)

        logits, cache = bundle.forward(params, cfg, row_tokens[:, cur_len - 1][:, None], cache)
        return (
            row_tokens, cur_len, cache, logits[:, 0], new_scores, key,
            best_tokens, best_score, best_len,
        )

    state = (
        row_tokens, prompt_len, cache, last_logits, beam_scores, key,
        jnp.zeros((max_total_len,), jnp.int32), jnp.asarray(_DEAD, jnp.float32),
        jnp.zeros((), jnp.int32),
    )
    (row_tokens, cur_len, _, _, beam_scores, _, best_tokens, best_score, best_len) = (
        jax.lax.while_loop(cond, body, state)
    )

    # surviving beams become candidates at the end (:189-192)
    norm = beam_scores / jnp.maximum(cur_len - prompt_len, 1).astype(jnp.float32)
    fbest = jnp.argmax(norm)
    improved = norm[fbest] > best_score
    best_tokens = jnp.where(improved, row_tokens[fbest], best_tokens)
    best_len = jnp.where(improved, cur_len, best_len)
    return best_tokens, best_len, cur_len - prompt_len


def random_width_beam_generate(
    bundle: ModelBundle,
    params,
    prompt,
    max_new_tokens: int,
    *,
    max_num_beams: int = 4,
    min_num_beams: int = 1,
    eos_token_id: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key: Optional[jax.Array] = None,
    details: bool = False,
    tp_mesh=None,
):
    """Target-only random-width beam sampling; returns the best candidate."""
    scfg = SamplingConfig(temperature, top_k, top_p, tp_mesh=tp_mesh)
    key = key if key is not None else jax.random.key(0)
    prompt_padded, p_len = pad_prompt(prompt)
    max_total = aligned_total(prompt_padded.shape[1] + max_new_tokens + 1)

    t0 = time.perf_counter()
    tokens, out_len, steps = _random_beam_device(
        params, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
        bundle=bundle, max_num_beams=max_num_beams, min_num_beams=min_num_beams,
        max_new_tokens=max_new_tokens, scfg=scfg, eos_token_id=eos_token_id,
        max_total_len=max_total,
    )
    wall = time.perf_counter() - t0
    out = jax.device_get(tokens)[: int(out_len)]
    if not details:
        return out
    n_gen = max(len(out) - p_len, 1)
    steps_i = int(steps)
    # target-only method: the reference harness block schema
    # (evaluation.py:997-1105) tracks the same phase/call fields as the
    # spec blocks with the approx side identically zero.
    from .phases import calibrate_phase_times

    _, t_fwd = calibrate_phase_times(
        bundle, params, bundle, params, draft_rows=max_num_beams,
        verify_rows=max_num_beams, gamma=1, verify_tokens=1,
        max_total=max_total,
    )
    target = min(steps_i * t_fwd, wall) if wall > 0 else steps_i * t_fwd
    return out, {
        "total_time": wall,
        "tokens_generated": len(out) - p_len,
        "s_per_token": wall / n_gen,
        "tokens_per_s": n_gen / wall if wall > 0 else float("nan"),
        "target_call_times": steps_i,
        "approx_call_times": 0,
        "approx_time": 0.0,
        "target_time": target,
        "other_time": max(wall - target, 0.0),
        "phase_split_method": "calibrated",
    }
