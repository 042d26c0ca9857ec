"""L0 sampling & math primitives (TPU-native).

Functional parity targets (reference: /root/reference/sampling/utils.py):
  * ``norm_logits``  — utils.py:182-210  (temperature -> top-k -> top-p -> softmax)
  * ``top_k_top_p_filter`` — utils.py:152-179
  * ``sample`` — utils.py:213-233 (multinomial + replace-zero-prob-draw-with-argmax guard)
  * ``max_fn`` — utils.py:236-245 (residual distribution norm(max(x,0)) with 1e-6 guard)
  * acceptance math — utils.py:247-255

Everything here is shape-static, batched, and jit-safe: filters are pure
``jnp`` ops over a fixed vocab axis, sampling uses explicit PRNG keys
(``jax.random.categorical`` == Gumbel argmax), and all "dynamic" behavior
(e.g. the reference's host-side zero-prob guard) is expressed as masked
selects so the whole thing fuses into the surrounding XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-jnp.inf)
# Matches the reference's zero-probability guard threshold (utils.py:228).
ZERO_PROB_EPS = 1e-9
# Matches the reference's residual-denominator guard (utils.py:245).
MAX_FN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling knobs (hashable -> usable as a jit static arg).

    Mirrors the (temperature, top_k, top_p) triple threaded through every
    reference algorithm (e.g. speculative_sampling.py:1880).
    """

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "temperature", float(self.temperature))
        object.__setattr__(self, "top_k", int(self.top_k))
        object.__setattr__(self, "top_p", float(self.top_p))


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Mask logits strictly below the k-th largest value to -inf.

    Parity: reference keeps ties with the k-th value (utils.py:166-169 uses
    ``logits < kth`` -> -inf), so we use a value threshold, not positions.
    """
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filter with the reference's exact shifted-cumsum semantics.

    Reference (utils.py:170-178): sort descending, cumsum of softmax, drop
    sorted position i iff cumprob[i-1] > p (the first sorted token is always
    kept). We reproduce positional semantics by scattering the keep mask back
    through the inverse argsort permutation rather than thresholding on
    values, so tie handling matches torch exactly.
    """
    if p <= 0.0:
        return logits
    order = jnp.argsort(-logits, axis=-1, stable=True)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep iff exclusive-prefix cumprob <= p  (shifted filter, first kept)
    keep_sorted = (cum - sorted_probs) <= p
    inv = jnp.argsort(order, axis=-1, stable=True)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, _NEG_INF)


def filter_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """temperature -> top-k -> top-p, returning filtered logits."""
    out = logits.astype(jnp.float32)
    if cfg.temperature != 1.0:
        out = out / cfg.temperature
    out = apply_top_k(out, cfg.top_k)
    out = apply_top_p(out, cfg.top_p)
    return out


def norm_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Full reference pipeline -> probability distribution [..., V].

    Parity: utils.py:182-210 (``log_softmax().exp()`` == softmax).
    """
    return jax.nn.softmax(filter_logits(logits, cfg), axis=-1)


def sample(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Draw one token id per leading batch element from ``probs``.

    Implements torch.multinomial semantics via Gumbel-argmax on log-probs,
    including the reference's guard replacing a zero-probability draw with
    the argmax (utils.py:228-230). Returns int32 ids with shape
    ``probs.shape[:-1]``.
    """
    logp = jnp.log(probs)
    tok = jax.random.categorical(key, logp, axis=-1)
    chosen = jnp.take_along_axis(probs, tok[..., None], axis=-1)[..., 0]
    safe = jnp.argmax(probs, axis=-1)
    return jnp.where(chosen < ZERO_PROB_EPS, safe, tok).astype(jnp.int32)


def sample_k(key: jax.Array, probs: jax.Array, k: int) -> jax.Array:
    """Draw ``k`` token ids without replacement (Gumbel top-k).

    Mirrors ``sample(probs, num_samples=k)`` (utils.py:213-233): when the
    support is smaller than ``k`` the reference falls back to sampling with
    replacement and then patches zero-prob draws with the argmax; here any
    over-drawn (zero-prob) winners are likewise replaced by the argmax.
    Returns int32 ids of shape ``probs.shape[:-1] + (k,)``.
    """
    logp = jnp.log(probs)
    g = jax.random.gumbel(key, probs.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logp + g, k)
    chosen = jnp.take_along_axis(probs, idx, axis=-1)
    safe = jnp.argmax(probs, axis=-1, keepdims=True)
    return jnp.where(chosen < ZERO_PROB_EPS, safe, idx).astype(jnp.int32)


def max_fn(x: jax.Array) -> jax.Array:
    """Residual distribution ``norm(max(x, 0))`` (utils.py:236-245)."""
    xm = jnp.maximum(x, 0.0)
    denom = jnp.sum(xm, axis=-1, keepdims=True) + MAX_FN_EPS
    return xm / denom


def acceptance_prob(p: jax.Array, q: jax.Array) -> jax.Array:
    """alpha = sum_x q(x) * min(1, p(x)/q(x))  (utils.py:247-250).

    Keeps the reference's ``q + 1e-6`` ratio guard for bit-level parity.
    """
    ratio = p / (q + MAX_FN_EPS)
    return jnp.sum(jnp.minimum(ratio, 1.0) * q, axis=-1)


def residual_update(p: jax.Array, q: jax.Array) -> jax.Array:
    """p <- norm(max(p - q, 0))  (utils.py:252-255)."""
    new_p = jnp.maximum(p - q, 0.0)
    return new_p / (jnp.sum(new_p, axis=-1, keepdims=True) + MAX_FN_EPS)


@partial(jax.jit, static_argnames=("cfg",))
def norm_logits_jit(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    return norm_logits(logits, cfg)
