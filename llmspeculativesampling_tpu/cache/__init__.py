"""KV-cache runtime (L2): static-shape, O(1)-rollback, dense + int8."""

from .kvcache import (
    KVCache,
    QuantKVCache,
    compact_tree_paths,
    init_cache,
    init_quant_cache,
    repeat_rows,
    rollback,
    select_rows,
    write_layer,
    write_layer_quant,
)

__all__ = [
    "KVCache",
    "QuantKVCache",
    "compact_tree_paths",
    "init_cache",
    "init_quant_cache",
    "repeat_rows",
    "rollback",
    "select_rows",
    "write_layer",
    "write_layer_quant",
]
