"""Dynamic-width acceptance DP (reference: /root/reference/sampling/utils.py:257-350).

Used by the dynamic-width beam speculative decoder (reference
speculative_sampling.py:254-267) to pick how many candidate beams to accept
this step: given the target joint distribution ``p`` and the draft joint
distribution ``q`` over the flattened beam x vocab axis, it computes the
distribution of the number of acceptable draws out of ``m``.

Reference recursion (utils.py:293-315), with alpha_i the acceptance
probability of draw i against the i-times-residual-updated target:

    F(i)   = alpha_{i-1} * prod_{j<i-1} (1 - alpha_j)      # first accept at i
    P(m,0) = prod_{j<m} (1 - alpha_j)
    P(m,k) = sum_{i=1..m} F(i) * P(m-i, k-1)

Note the reference reuses alphas *from index 0* in every sub-problem — we
reproduce exactly that computation, not a re-derivation.

The reference also has a quirky output layout (utils.py:330-335):
``prob[k-1] = P(m,k)`` for k in 0..m, i.e. the returned vector is
``[P(m,1), ..., P(m,m), P(m,0)]`` (P(m,0) wraps to the last slot). The
threshold scan (utils.py:340-350) walks that layout from the end. Both are
reproduced bit-for-bit so ``expect_cnt`` parity holds.

TPU design: the only device-sized work is the m acceptance probabilities
(vocab-axis reductions, computed vectorized via ``lax.scan`` over residual
updates); the O(m^3) DP is over scalars with static m and unrolls into a
handful of fused scalar ops inside the surrounding jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import acceptance_prob, residual_update


def acceptance_alphas(p: jax.Array, q: jax.Array, m: int) -> jax.Array:
    """alpha_i for i < m with p residual-updated between draws.

    Mirrors the p_list construction of utils.py:317-327: p_0 = p,
    p_{i+1} = norm(max(p_i - q, 0)); alpha_i = sum q*min(1, p_i/q).
    Returns float32 [m].
    """

    def step(cur_p, _):
        alpha = acceptance_prob(cur_p, q)
        return residual_update(cur_p, q), alpha

    _, alphas = jax.lax.scan(step, p.astype(jnp.float32), None, length=m)
    return alphas


def num_accept_distribution(alphas: jax.Array, m: int):
    """P(#accepted = k) for k = 0..m from the reference recursion.

    Returns ``(probs, expect)`` where ``probs`` is float32 [m+1] in the
    *clean* layout probs[k] = P(m,k), and ``expect`` = sum k * P(m,k).
    """
    one_minus = 1.0 - alphas
    # survival[i] = prod_{j<i} (1-alpha_j), i = 0..m
    survival = jnp.concatenate([jnp.ones((1,), jnp.float32), jnp.cumprod(one_minus)])
    # F[i] = alpha_{i-1} * survival[i-1] for i = 1..m  (first accept at draw i)
    first_acc = alphas * survival[:-1]  # first_acc[i-1] == F(i)

    # table[mm][k] = P(mm, k); small static m -> plain Python unroll.
    table = [[jnp.float32(0.0)] * (m + 1) for _ in range(m + 1)]
    table[0][0] = jnp.float32(1.0)
    for mm in range(1, m + 1):
        table[mm][0] = survival[mm]
        for k in range(1, mm + 1):
            acc = jnp.float32(0.0)
            for i in range(1, mm + 1):
                acc = acc + first_acc[i - 1] * table[mm - i][k - 1]
            table[mm][k] = acc

    probs = jnp.stack([table[m][k] for k in range(m + 1)])
    ks = jnp.arange(m + 1, dtype=jnp.float32)
    return probs, jnp.sum(probs * ks)


def get_num_acc_prob(p: jax.Array, q: jax.Array, m: int):
    """Exact-parity port of utils.py:317-338 *including* the layout quirk.

    Returns ``(p_width, expect)`` where ``p_width`` is [m+1] laid out as
    [P(m,1), ..., P(m,m), P(m,0)] (reference writes ``prob[k-1]``).
    """
    probs, expect = num_accept_distribution(acceptance_alphas(p, q, m), m)
    p_width = jnp.concatenate([probs[1:], probs[:1]])
    return p_width, expect


def get_expect_cnt_by_thres(p_width: jax.Array, expect_thres: float) -> jax.Array:
    """Exact-parity port of utils.py:340-350 as a vectorized scan.

    Reference walks n = len-1 .. 0 accumulating p_width[n] until the running
    sum reaches ``expect_thres``; returns the final n (int32 scalar).
    """
    rev = p_width[::-1]
    cum = jnp.cumsum(rev)
    n_steps = jnp.argmax(cum >= expect_thres) + 1
    # If the threshold is never reached the loop runs to n == 0.
    n_steps = jnp.where(jnp.any(cum >= expect_thres), n_steps, p_width.shape[0])
    return (p_width.shape[0] - n_steps).astype(jnp.int32)
