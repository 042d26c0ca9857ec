"""Speculative-core correctness: greedy equivalence + exact-distribution tests.

SURVEY.md §4 implication (b): the property the reference only asserts in
comments — speculative output distribution == target autoregressive
distribution — is checked statistically here with vmapped seeded runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.autoregressive import (
    _ar_generate_device,
    autoregressive_generate,
)
from llmspeculativesampling_tpu.engine.speculative import (
    _spec_generate_device,
    speculative_generate,
)
from llmspeculativesampling_tpu.engine.types import ModelBundle, pad_prompt
from llmspeculativesampling_tpu.models import llama
from llmspeculativesampling_tpu.ops.sampling import SamplingConfig


def make_bundle(layers, seed, vocab=64, hidden=32, heads=4):
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=heads,
        max_position=512,
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.key(seed))
    return ModelBundle("llama", cfg, llama.forward), params


@pytest.fixture(scope="module")
def models():
    bd, pd = make_bundle(1, seed=10)
    bt, pt = make_bundle(2, seed=20)
    return bd, pd, bt, pt


PROMPT = [3, 14, 15, 9, 26, 5]
EOS = 63  # arbitrary id unlikely under random init


def test_greedy_spec_equals_greedy_ar(models):
    """top_k=1 makes p,q one-hot: spec must reproduce target greedy decode
    token-for-token (accept when argmaxes agree, resample target argmax
    when they don't)."""
    bd, pd, bt, pt = models
    ar = autoregressive_generate(
        bt, pt, PROMPT, 24, eos_token_id=EOS, top_k=1, key=jax.random.key(0)
    )
    for gamma in (1, 2, 4):
        spec = speculative_generate(
            bd, pd, bt, pt, PROMPT, 24,
            gamma=gamma, eos_token_id=EOS, top_k=1, key=jax.random.key(1),
        )
        np.testing.assert_array_equal(spec[: len(ar)], ar)


def test_identical_models_all_accept(models):
    """Draft == target -> every draft accepted; output == plain sampling."""
    _, _, bt, pt = models
    out, d = speculative_generate(
        bt, pt, bt, pt, PROMPT, 16,
        gamma=4, eos_token_id=EOS, temperature=1.0, top_k=20, top_p=0.9,
        key=jax.random.key(2), details=True,
    )
    assert d["resample_count"] == 0
    assert d["accepted_count"] == 4 * d["target_call_times"]
    assert d["acc_rate"] > 0.999


def _first_token_hist(device_fn, n_runs, *args, **kwargs):
    keys = jax.random.split(jax.random.key(123), n_runs)
    outs = jax.vmap(lambda k: device_fn(*args, key=k, **kwargs))(keys)
    return outs


def test_spec_first_token_distribution_matches_target(models):
    """Exact-distribution property: histogram of the first generated token
    under speculative sampling must match the target model's filtered
    distribution (which is what AR sampling draws from)."""
    bd, pd, bt, pt = models
    scfg = SamplingConfig(1.0, 8, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)
    n = 20000

    # exact target first-token distribution
    from llmspeculativesampling_tpu.cache.kvcache import init_cache
    from llmspeculativesampling_tpu.ops.sampling import norm_logits

    cache = bt.make_cache(1, 128)
    logits, _ = bt.forward(pt, bt.cfg, jnp.asarray(prompt_padded), cache)
    p_exact = np.asarray(norm_logits(logits[:, p_len - 1], scfg))[0]

    def one_run(key):
        state = _spec_generate_device(
            pd, pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32),
            key, None,
            bundle_d=bd, bundle_t=bt, gamma=3, max_new_tokens=1,
            scfg=scfg, eos_token_id=EOS, max_total_len=prompt_padded.shape[1] + 5,
        )
        return state.tokens[0, p_len]

    keys = jax.random.split(jax.random.key(7), n)
    draws = np.asarray(jax.vmap(one_run)(keys))
    hist = np.bincount(draws, minlength=bt.cfg.vocab_size) / n
    tv = 0.5 * np.abs(hist - p_exact).sum()
    assert tv < 0.03, f"TV distance {tv:.4f} too large: spec != target distribution"


def test_ar_first_token_distribution_sanity(models):
    """Control: the AR engine itself matches the exact distribution."""
    _, _, bt, pt = models
    scfg = SamplingConfig(1.0, 8, 0.0)
    prompt_padded, p_len = pad_prompt(PROMPT)
    n = 20000

    from llmspeculativesampling_tpu.ops.sampling import norm_logits

    cache = bt.make_cache(1, 128)
    logits, _ = bt.forward(pt, bt.cfg, jnp.asarray(prompt_padded), cache)
    p_exact = np.asarray(norm_logits(logits[:, p_len - 1], scfg))[0]

    def one_run(key):
        tokens, _ = _ar_generate_device(
            pt, jnp.asarray(prompt_padded), jnp.asarray(p_len, jnp.int32), key,
            bundle=bt, max_new_tokens=1, scfg=scfg, eos_token_id=EOS,
            max_total_len=prompt_padded.shape[1] + 2,
        )
        return tokens[0, p_len]

    keys = jax.random.split(jax.random.key(8), n)
    draws = np.asarray(jax.vmap(one_run)(keys))
    hist = np.bincount(draws, minlength=bt.cfg.vocab_size) / n
    tv = 0.5 * np.abs(hist - p_exact).sum()
    assert tv < 0.03, f"AR control TV {tv:.4f}"


def test_eos_truncation(models):
    """Make the greedy continuation's 3rd token the EOS: generation must
    stop there and keep the EOS."""
    bd, pd, bt, pt = models
    ar = autoregressive_generate(
        bt, pt, PROMPT, 8, eos_token_id=999, top_k=1, key=jax.random.key(0)
    )
    eos = int(ar[len(PROMPT) + 2])  # 3rd generated token
    spec = speculative_generate(
        bd, pd, bt, pt, PROMPT, 8, gamma=4, eos_token_id=eos, top_k=1,
        key=jax.random.key(3),
    )
    assert len(spec) == len(PROMPT) + 3
    assert spec[-1] == eos
    assert not np.any(spec[len(PROMPT):-1] == eos)


def test_details_schema(models):
    bd, pd, bt, pt = models
    out, d = speculative_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=4, eos_token_id=EOS,
        top_k=10, key=jax.random.key(4), details=True,
    )
    for k in ("acc_len", "acc_rate", "target_call_times", "approx_call_times",
              "accepted_count", "resample_count", "target_sample_count",
              "tokens_per_s", "total_time"):
        assert k in d
    assert len(d["acc_len"]) == d["target_call_times"]
    assert sum(d["acc_len"]) == d["accepted_count"]
    assert 0.0 <= d["acc_rate"] <= 1.0
    # every step commits between 1 and gamma+1 tokens
    assert d["tokens_generated"] <= d["target_call_times"] * 5


def test_random_seed_reproducibility(models):
    bd, pd, bt, pt = models
    a = speculative_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=3, eos_token_id=EOS,
        top_k=10, key=jax.random.key(5), random_seed=42,
    )
    b = speculative_generate(
        bd, pd, bt, pt, PROMPT, 12, gamma=3, eos_token_id=EOS,
        top_k=10, key=jax.random.key(5), random_seed=42,
    )
    np.testing.assert_array_equal(a, b)


def test_stepwise_mode_matches_fused_and_reports_phases(models):
    """stepwise=True (host-stepped diagnostic) must produce the same tokens
    as the fused program for the same key, and fill the reference's
    approx/target/other phase-time split (speculative_sampling.py:2061-2074)."""
    bd, pd, bt, pt = models
    prompt = list(range(5, 25))
    kw = dict(gamma=3, eos_token_id=-1, temperature=1.0, top_k=10, top_p=0.9,
              key=jax.random.key(11), details=True)
    out_f, d_f = speculative_generate(bd, pd, bt, pt, prompt, 12, **kw)
    out_s, d_s = speculative_generate(bd, pd, bt, pt, prompt, 12, stepwise=True, **kw)
    np.testing.assert_array_equal(out_f, out_s)
    assert d_s["approx_time"] > 0 and d_s["target_time"] > 0
    assert d_s["acc_len"] == list(d_f["acc_len"])
    assert abs(d_s["acc_rate"] - d_f["acc_rate"]) < 1e-5
