"""In-repo tiny-pair training (pure JAX).

Exists to anchor the framework's quality claims on *trained* weights:
zero egress blocks real checkpoints, so every acceptance/quality number
would otherwise ride random synthetic pairs. ``train_tiny_pair`` trains a
small byte-level Llama target plus an independent smaller draft on text
already in this repository, giving a draft/target pair whose agreement
comes from *learning the same distribution* — the mechanism behind real
pairs like llama-68m / Llama-2-13b (reference README.md:9) — rather than
from weight-sharing tricks.
"""

from .tiny import (
    build_repo_corpus,
    pinned_corpus,
    sample_batches,
    train_lm,
    train_tiny_pair,
)

__all__ = [
    "build_repo_corpus",
    "pinned_corpus",
    "sample_batches",
    "train_lm",
    "train_tiny_pair",
]
