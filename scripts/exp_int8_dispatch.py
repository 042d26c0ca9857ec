"""(a) pallas-vs-XLA int8 matmul at prefill/decode M; (b) spec gamma 8-12
with XLA int8; (c) AR with argmax vs sampled (sampling-cost bound).
All timings via data fetch (trustworthy on the tunnel)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("LLMSS_FORCE_PALLAS", "0")

import numpy as np
import jax
import jax.numpy as jnp


def fetch_time(f, *args, iters=20):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def part_a():
    from llmspeculativesampling_tpu.kernels.int8_matmul import _int8_matmul_2d, int8_matmul_ref

    k, n = 2048, 8192
    wq = jax.random.randint(jax.random.key(0), (k, n), -127, 127, jnp.int8)
    sc = jnp.abs(jax.random.normal(jax.random.key(1), (n,), jnp.float32)) * 0.01
    for m in (1, 16, 256, 2048):
        x = jax.random.normal(jax.random.key(2), (m, k), jnp.bfloat16)

        def pal(x):
            bm = min(256, max(16, -(-m // 16) * 16))
            return _int8_matmul_2d(x, wq, sc, block_m=bm, block_n=512, block_k=512, interpret=False)

        def ref(x):
            return int8_matmul_ref(x, wq, sc)

        # chain iterations? independent calls pipeline; fetch forces all.
        tp = fetch_time(jax.jit(pal), x)
        tr = fetch_time(jax.jit(ref), x)
        print(f"m={m:5d}: pallas={tp*1e6:9.1f} us  xla={tr*1e6:9.1f} us", flush=True)


def part_bc():
    sys.argv = [sys.argv[0]]
    import scripts.exp_quant_bench as q

    from llmspeculativesampling_tpu.engine.autoregressive import autoregressive_generate
    from llmspeculativesampling_tpu.engine.speculative import speculative_generate

    bd, pd, bt, pt = q.build_models(True)
    prompt = list(np.random.default_rng(0).integers(100, 31000, 64))
    kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)

    best = 0
    for k in (1, 2, 3):
        _, d = autoregressive_generate(bt, pt, prompt, 128, key=jax.random.key(k), details=True, **kw)
        if k > 1:
            best = max(best, d["tokens_per_s"])
    print(f"AR sampled: {best:.1f} tok/s", flush=True)

    best = 0
    for k in (1, 2, 3):
        _, d = autoregressive_generate(
            bt, pt, prompt, 128, key=jax.random.key(k), details=True,
            eos_token_id=2, temperature=1.0, top_k=1, top_p=0.0)
        if k > 1:
            best = max(best, d["tokens_per_s"])
    print(f"AR greedy(top_k=1): {best:.1f} tok/s", flush=True)

    for g in (8, 10, 12):
        best, acc = 0, 0
        for k in (1, 2, 3):
            _, d = speculative_generate(
                bd, pd, bt, pt, prompt, 128, gamma=g, key=jax.random.key(k), details=True, **kw)
            if k > 1 and d["tokens_per_s"] > best:
                best, acc = d["tokens_per_s"], d["acc_rate"]
        print(f"spec gamma={g}: {best:.1f} tok/s (acc={acc:.3f})", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    part_a()
    part_bc()
