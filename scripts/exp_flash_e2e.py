"""E2E A/B of the flash-decode kernel inside speculative generation at
long(er) context on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from bench import build_models
from llmspeculativesampling_tpu.engine.speculative import speculative_generate


def run(flash, p_len, gamma=8, reps=3):
    os.environ["LLMSS_FLASH"] = flash
    bd, pd, bt, pt = build_models(quantize=True)
    prompt = list(np.random.default_rng(0).integers(100, 31000, p_len))
    kw = dict(eos_token_id=2, temperature=1.0, top_k=20, top_p=0.9)
    best = 0.0
    for k in range(1, reps + 1):
        _, d = speculative_generate(bd, pd, bt, pt, prompt, 128, gamma=gamma,
                                    key=jax.random.key(k), details=True, **kw)
        if k > 1:
            best = max(best, d["tokens_per_s"])
    return best


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    for p_len in (512, 1408):
        off = run("0", p_len)
        on = run("1", p_len)
        print(f"prompt={p_len:5d}: flash-off {off:7.1f} tok/s   flash-on {on:7.1f} tok/s "
              f"({on/off:.2f}x)", flush=True)
