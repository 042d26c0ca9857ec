"""Device-side-loop microbench of the sampling hot ops.

Wraps each candidate in a lax.fori_loop with a data dependency so one
dispatch measures N iterations of pure device time (the axon tunnel makes
per-dispatch host timing useless).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

V = 32000
N = 200


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:36s}: {dt/N*1e6:9.1f} us/iter", flush=True)


def chain(op):
    """fori_loop that feeds a scalar perturbation back into the input."""

    def run(logits):
        def body(i, carry):
            x, acc = carry
            r = op(x + acc * 1e-6, i)
            return x, r.astype(jnp.float32).sum()

        _, acc = jax.lax.fori_loop(0, N, body, (logits, jnp.float32(0)))
        return acc

    return run


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.key(0)
    logits = jax.random.normal(key, (1, V), jnp.float32)
    logits5 = jax.random.normal(key, (5, V), jnp.float32)

    from llmspeculativesampling_tpu.ops.sampling import (
        SamplingConfig, dist_norm, dist_sample, norm_logits,
    )

    scfg = SamplingConfig(1.0, 20, 0.9)

    timeit("lax.top_k k=20 [1,32k]", chain(lambda x, i: jax.lax.top_k(x, 20)[0]), logits)
    timeit("lax.top_k k=20 [5,32k]", chain(lambda x, i: jax.lax.top_k(x, 20)[0]), logits5)
    timeit("approx_max_k k=20 [1,32k]", chain(lambda x, i: jax.lax.approx_max_k(x, 20)[0]), logits)
    timeit("approx_max_k k=20 recall=1 [1,32k]",
           chain(lambda x, i: jax.lax.approx_max_k(x, 20, recall_target=1.0)[0]), logits)
    timeit("max only [1,32k]", chain(lambda x, i: jnp.max(x, axis=-1)), logits)
    timeit("argmax only [1,32k]", chain(lambda x, i: jnp.argmax(x, axis=-1).astype(jnp.float32)), logits)

    def norm_sample(x, i):
        d = dist_norm(x, scfg)
        return dist_sample(jax.random.fold_in(key, i), d).astype(jnp.float32)

    timeit("dist_norm+sample sparse [1,32k]", chain(norm_sample), logits)
    timeit("dist_norm+sample sparse [5,32k]", chain(norm_sample), logits5)

    def norm_dense(x, i):
        return norm_logits(x, scfg)

    timeit("norm_logits dense [1,32k]", chain(norm_dense), logits)

    # two-stage exact top-k: tilewise top-k then top-k of candidates
    def tiled_topk(x, i):
        xt = x.reshape(x.shape[0], 125, 256)           # 125 tiles of 256
        vals, idx = jax.lax.top_k(xt, 20)              # [B,125,20]
        flat = vals.reshape(x.shape[0], -1)
        v2, i2 = jax.lax.top_k(flat, 20)
        return v2

    timeit("tiled top_k (256-col tiles)", chain(tiled_topk), logits)

    def tiled_topk2(x, i):
        xt = x.reshape(x.shape[0], 25, 1280)
        vals, idx = jax.lax.top_k(xt, 20)
        flat = vals.reshape(x.shape[0], -1)
        v2, i2 = jax.lax.top_k(flat, 20)
        return v2

    timeit("tiled top_k (1280-col tiles)", chain(tiled_topk2), logits)

    # threshold-based: 20th value via iterative max? use sort-free select:
    def thresh20(x, i):
        # max of each 128-lane group, k rounds of extract-max over group maxima
        v = x
        def extract(c, _):
            vv, m = c
            mx = jnp.max(vv, axis=-1, keepdims=True)
            vv = jnp.where(vv == mx, -jnp.inf, vv)
            return (vv, mx), mx
        (_, _), ms = jax.lax.scan(extract, (v, jnp.zeros((x.shape[0], 1))), None, length=20)
        return ms[-1]

    timeit("20x extract-max scan", chain(thresh20), logits)


if __name__ == "__main__":
    main()
