"""Measure the pad-to-128 paged-lane rescue on the real chip (VERDICT r2 #6).

The reference's draft models (llama-68m, opt-125m) have head_dim 64. The
folded sub-128 paged flash lane wedges Mosaic on real chips
(kernels/flash_decode.py::should_use_paged note), so a D=64 pool falls
back to the materializing XLA gather. The rescue: allocate the pool at
D=128 (zero-padded lanes, cache/paged.py::pad_head_dim) so the NATIVE
lane serves it — at the cost of 2x that model's (tiny) pool.

This microbench times the paged ops a 68m-geometry draft actually runs in
serving — batched 1-token decode and a (gamma+1)-token verify window over
a populated pool — for pool D=64 (gather fallback) vs D=128 (native flash
lane). Run on the chip:  python scripts/exp_pad_lane.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from llmspeculativesampling_tpu.cache.paged import (
    PageAllocator, init_paged_cache, set_row_table,
)
from llmspeculativesampling_tpu.core.config import LlamaConfig
from llmspeculativesampling_tpu.engine.types import ModelBundle
from llmspeculativesampling_tpu.models import llama


def bench(pool_d: int, rows: int = 16, page: int = 128, fill: int = 384,
          gamma: int = 8, reps: int = 30, pages_per: int = 4):
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=768, intermediate_size=3072,
        num_layers=2, num_heads=12, num_kv_heads=12,  # llama-68m: D=64
        max_position=2048, dtype="bfloat16",
    )
    assert cfg.head_dim == 64
    bundle = ModelBundle("llama", cfg, llama.forward)
    params = llama.init_params(cfg, jax.random.key(0))

    alloc = PageAllocator(num_blocks=rows * pages_per, page=page,
                          max_pages=pages_per)
    cache = init_paged_cache(cfg.num_layers, rows * pages_per,
                             cfg.num_kv_heads, page, pool_d, rows,
                             pages_per, cfg.jnp_dtype)
    for r in range(rows):
        cache = set_row_table(
            cache, r, jnp.asarray(alloc.table_row(alloc.alloc(pages_per * page))), 0)

    fwd = jax.jit(lambda p, t, c: bundle.forward(p, cfg, t, c))
    rng = np.random.default_rng(0)
    # populate `fill` positions
    tok0 = jnp.asarray(rng.integers(5, 31000, (rows, fill), np.int32))
    _, cache = fwd(params, tok0, cache)

    # Honest axon timing (scripts/exp_timing_truth.py): N forwards inside
    # ONE jitted fori_loop, result forced with a host fetch —
    # block_until_ready on a single remote dispatch does not sync the
    # tunnel and under-reports by orders of magnitude.
    out = {}
    for name, s in (("decode s=1", 1), (f"verify s={gamma + 1}", gamma + 1)):
        toks = jnp.asarray(rng.integers(5, 31000, (rows, s), np.int32))

        @jax.jit
        def run(params, toks, cache):
            def body(i, acc):
                logits, _ = bundle.forward(params, cfg, toks + (acc % 3), cache)
                return acc + jnp.argmax(logits[0, -1, :128]).astype(jnp.int32)

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        int(run(params, toks, cache))  # compile + force
        t0 = time.perf_counter()
        int(run(params, toks, cache))
        out[name] = (time.perf_counter() - t0) / reps * 1e3
    return out


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    from llmspeculativesampling_tpu.kernels.flash_decode import should_use_paged

    for fill, pages in ((384, 4), (1920, 16)):
        print(f"-- pooled context {fill} positions ({pages} pages/row)")
        for d in (64, 128):
            lane = ("native flash" if should_use_paged(1, 128, d) else
                    "XLA gather fallback")
            r = bench(d, fill=fill, pages_per=pages)
            row = "  ".join(f"{k}: {v:.3f} ms" for k, v in r.items())
            print(f"pool D={d:3d} ({lane:>19}): {row}", flush=True)


if __name__ == "__main__":
    main()
