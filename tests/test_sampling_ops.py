"""L0 math parity tests vs a torch oracle.

The oracle functions re-state the reference semantics
(/root/reference/sampling/utils.py:152-350) in minimal torch so the JAX ops
can be checked numerically without importing the reference.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.ops import (
    SamplingConfig,
    acceptance_alphas,
    filter_logits,
    get_expect_cnt_by_thres,
    get_num_acc_prob,
    max_fn,
    norm_logits,
    residual_update,
    sample,
    sample_k,
)


# ---------------------------------------------------------------- oracles
def torch_top_k_top_p(logits: torch.Tensor, top_k: int, top_p: float):
    logits = logits.clone()
    if top_k and top_k > 0:
        kth = torch.topk(logits, min(top_k, logits.size(-1)))[0][:, [-1]]
        logits[logits < kth] = float("-inf")
    if top_p and top_p > 0.0:
        sorted_logits, sorted_idx = torch.sort(logits, descending=True)
        cum = torch.cumsum(F.softmax(sorted_logits, dim=-1), dim=-1)
        filt = cum > top_p
        filt[..., 1:] = filt[..., :-1].clone()
        filt[..., 0] = 0
        remove = filt.scatter(1, sorted_idx, filt)
        logits[remove] = float("-inf")
    return logits


def torch_norm_logits(logits, temperature, top_k, top_p):
    out = torch_top_k_top_p(logits / temperature, top_k, top_p)
    return torch.log_softmax(out, dim=-1).exp()


def torch_max_fn(x):
    xm = torch.where(x > 0, x, torch.zeros_like(x))
    return xm / (xm.sum(dim=-1, keepdim=True) + 1e-6)


def torch_alphas(p, q, m):
    out = []
    cur = p.clone()
    for _ in range(m):
        ratio = torch.clamp(cur / (q + 1e-6), max=1.0)
        out.append(float((ratio * q).sum()))
        cur = torch.clamp(cur - q, min=0.0)
        cur = cur / (cur.sum() + 1e-6)
    return out


def torch_num_acc_prob(p, q, m):
    """Reference DP incl. the prob[k-1] layout quirk (utils.py:317-338)."""
    alphas = torch_alphas(p, q, m)

    def first_acc(i):
        out = alphas[i - 1]
        for j in range(i - 1):
            out *= 1 - alphas[j]
        return out

    memo = {}

    def P(mm, k):
        if mm < k:
            return 0.0
        if mm == 0 and k == 0:
            return 1.0
        if (mm, k) in memo:
            return memo[(mm, k)]
        if k == 0:
            out = 1.0
            for j in range(mm):
                out *= 1 - alphas[j]
        else:
            out = sum(first_acc(i) * P(mm - i, k - 1) for i in range(1, mm + 1))
        memo[(mm, k)] = out
        return out

    prob = torch.zeros(m + 1)
    expect = 0.0
    for k in range(m + 1):
        pk = P(m, k)
        prob[k - 1] = pk  # quirk: k=0 wraps to the last slot
        expect += pk * k
    return prob, expect


def torch_expect_cnt(p_width, thres):
    n = p_width.numel()
    cum = 0.0
    while cum < thres and n > 0:
        n -= 1
        cum += float(p_width[n])
    return n


# ------------------------------------------------------------------ tests
@pytest.mark.parametrize("top_k,top_p", [(0, 0.0), (20, 0.0), (0, 0.9), (20, 0.9), (5, 0.5)])
@pytest.mark.parametrize("temperature", [1.0, 0.7, 1.3])
def test_norm_logits_parity(top_k, top_p, temperature):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 257)).astype(np.float32) * 3.0
    ours = np.asarray(norm_logits(jnp.asarray(logits), SamplingConfig(temperature, top_k, top_p)))
    ref = torch_norm_logits(torch.tensor(logits), temperature, top_k, top_p).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_top_p_tie_positions_match_torch():
    # duplicated logit values across the nucleus boundary
    logits = np.array([[2.0, 2.0, 2.0, 1.0, 0.0, 2.0]], dtype=np.float32)
    ours = np.asarray(filter_logits(jnp.asarray(logits), SamplingConfig(1.0, 0, 0.5)))
    ref = torch_top_k_top_p(torch.tensor(logits), 0, 0.5).numpy()
    np.testing.assert_array_equal(np.isneginf(ours), np.isneginf(ref))


def test_max_fn_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 100)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(max_fn(jnp.asarray(x))),
        torch_max_fn(torch.tensor(x)).numpy(),
        atol=1e-6,
    )


def test_residual_update_matches_max_fn_of_diff():
    rng = np.random.default_rng(2)
    p = rng.dirichlet(np.ones(64)).astype(np.float32)[None]
    q = rng.dirichlet(np.ones(64)).astype(np.float32)[None]
    np.testing.assert_allclose(
        np.asarray(residual_update(jnp.asarray(p), jnp.asarray(q))),
        torch_max_fn(torch.tensor(p - q)).numpy(),
        atol=1e-6,
    )


def test_sample_respects_filtered_support():
    # only tokens 3 and 7 have mass; every draw must land there
    probs = np.zeros((2, 16), dtype=np.float32)
    probs[:, 3] = 0.5
    probs[:, 7] = 0.5
    keys = jax.random.split(jax.random.key(0), 50)
    draws = np.asarray(jax.vmap(lambda k: sample(k, jnp.asarray(probs)))(keys))
    assert set(np.unique(draws)) <= {3, 7}


def test_sample_distribution_statistics():
    probs = jnp.asarray(np.array([[0.1, 0.2, 0.3, 0.4]], dtype=np.float32))
    keys = jax.random.split(jax.random.key(1), 8000)
    draws = np.asarray(jax.vmap(lambda k: sample(k, probs))(keys)).ravel()
    freq = np.bincount(draws, minlength=4) / draws.size
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_sample_zero_prob_guard():
    # degenerate distribution: guard must return argmax, never an invalid id
    probs = np.zeros((1, 8), dtype=np.float32)
    probs[0, 5] = 1.0
    for seed in range(10):
        tok = np.asarray(sample(jax.random.key(seed), jnp.asarray(probs)))
        assert tok[0] == 5


def test_sample_k_without_replacement():
    probs = np.full((1, 6), 1 / 6, dtype=np.float32)
    for seed in range(20):
        idx = np.asarray(sample_k(jax.random.key(seed), jnp.asarray(probs), 6))[0]
        assert sorted(idx.tolist()) == list(range(6))


def test_sample_k_small_support_falls_back_to_argmax():
    probs = np.zeros((1, 8), dtype=np.float32)
    probs[0, 2] = 0.9
    probs[0, 6] = 0.1
    idx = np.asarray(sample_k(jax.random.key(3), jnp.asarray(probs), 4))[0]
    assert set(idx.tolist()) <= {2, 6}


@pytest.mark.parametrize("m", [1, 2, 4, 6])
def test_acceptance_dp_parity(m):
    rng = np.random.default_rng(7)
    p = rng.dirichlet(np.ones(50) * 0.3).astype(np.float32)
    q = rng.dirichlet(np.ones(50) * 0.3).astype(np.float32)
    alphas = np.asarray(acceptance_alphas(jnp.asarray(p), jnp.asarray(q), m))
    np.testing.assert_allclose(alphas, torch_alphas(torch.tensor(p), torch.tensor(q), m), atol=1e-5)

    p_width, expect = get_num_acc_prob(jnp.asarray(p), jnp.asarray(q), m)
    ref_width, ref_expect = torch_num_acc_prob(torch.tensor(p), torch.tensor(q), m)
    np.testing.assert_allclose(np.asarray(p_width), ref_width.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(expect), ref_expect, atol=1e-5)


@pytest.mark.parametrize("thres", [0.3, 0.5, 0.7, 0.9, 2.0])
def test_expect_cnt_by_thres_parity(thres):
    rng = np.random.default_rng(11)
    for _ in range(5):
        pw = rng.dirichlet(np.ones(5)).astype(np.float32)
        ours = int(get_expect_cnt_by_thres(jnp.asarray(pw), thres))
        ref = torch_expect_cnt(torch.tensor(pw), thres)
        assert ours == ref


# ------------------------------------------------- sparse top-k-space path
class TestTopKDist:
    def _cfg(self, **kw):
        from llmspeculativesampling_tpu.ops.sampling import SamplingConfig
        d = dict(temperature=1.0, top_k=20, top_p=0.9)
        d.update(kw)
        return SamplingConfig(**d)

    def test_norm_logits_topk_matches_dense(self):
        from llmspeculativesampling_tpu.ops.sampling import (
            dense_probs, norm_logits, norm_logits_topk)
        for seed, cfg in [(0, self._cfg()), (1, self._cfg(top_p=0.0)),
                          (2, self._cfg(temperature=0.7)),
                          (3, self._cfg(top_k=5, top_p=0.5))]:
            logits = jax.random.normal(jax.random.key(seed), (3, 500)) * 3
            dense = np.asarray(norm_logits(logits, cfg))
            sparse = np.asarray(dense_probs(norm_logits_topk(logits, cfg), 500))
            np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-7)

    def test_prob_of_and_residual_match_dense(self):
        from llmspeculativesampling_tpu.ops.sampling import (
            dense_probs, max_fn, norm_logits, norm_logits_topk, prob_of_topk,
            residual_topk)
        cfg = self._cfg()
        kp, kq = jax.random.split(jax.random.key(7))
        lp = jax.random.normal(kp, (4, 300)) * 2
        lq = jax.random.normal(kq, (4, 300)) * 2
        p_s, q_s = norm_logits_topk(lp, cfg), norm_logits_topk(lq, cfg)
        p_d, q_d = norm_logits(lp, cfg), norm_logits(lq, cfg)
        tok = jnp.asarray([5, 17, 2, int(jnp.argmax(lp[3]))], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(prob_of_topk(p_s, tok)),
            np.asarray(jnp.take_along_axis(p_d, tok[:, None], -1)[:, 0]),
            rtol=1e-5, atol=1e-7)
        resid_d = np.asarray(max_fn(p_d - q_d))
        resid_s = np.asarray(dense_probs(residual_topk(p_s, q_s), 300))
        np.testing.assert_allclose(resid_s, resid_d, rtol=1e-4, atol=1e-6)

    def test_sample_topk_statistics(self):
        from llmspeculativesampling_tpu.ops.sampling import (
            dense_probs, norm_logits_topk, sample_topk)
        cfg = self._cfg(top_k=8, top_p=0.8)
        logits = jax.random.normal(jax.random.key(0), (50,)) * 2
        dist = norm_logits_topk(logits, cfg)
        probs = np.asarray(dense_probs(dist, 50))
        n = 20000
        keys = jax.random.split(jax.random.key(1), n)
        draws = np.asarray(jax.jit(jax.vmap(lambda k: sample_topk(k, dist)))(keys))
        hist = np.bincount(draws, minlength=50) / n
        assert np.abs(hist - probs).max() < 0.02
        assert set(np.unique(draws)) <= set(np.nonzero(probs)[0].tolist())

    def test_dispatch_picks_representation(self):
        from llmspeculativesampling_tpu.ops.sampling import (
            TopKDist, dist_norm, dist_pad_zero_rows, dist_take)
        logits = jax.random.normal(jax.random.key(0), (2, 64))
        sp = dist_norm(logits, self._cfg())
        de = dist_norm(logits, self._cfg(top_k=0, top_p=0.9))
        assert isinstance(sp, TopKDist) and not isinstance(de, TopKDist)
        padded = dist_pad_zero_rows(sp, 1)
        assert padded.idx.shape[0] == 3
        row = dist_take(padded, jnp.int32(2))
        assert float(row.probs.sum()) == 0.0


def test_tp_mesh_requires_topk():
    """tp_mesh + top_k=0 used to silently fall back to the dense path and
    all-gather full-vocab logits every step (the cliff the distributed
    top-k exists to avoid); it now fails loudly (VERDICT round-2 ask #7)."""
    import jax
    from jax.sharding import Mesh
    from llmspeculativesampling_tpu.ops.sampling import SamplingConfig

    mesh = Mesh(np.array(jax.devices()).reshape(1, -1), ("dp", "tp"))
    with pytest.raises(ValueError, match="top_k"):
        SamplingConfig(1.0, 0, 0.9, tp_mesh=mesh)
    SamplingConfig(1.0, 20, 0.9, tp_mesh=mesh)  # fine
