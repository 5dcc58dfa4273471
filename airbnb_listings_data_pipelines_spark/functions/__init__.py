from .dialect import (
    dec,
    multi_replace,
    nullify_tokens,
    pct,
    split_part,
    top1_per_group,
    try_decimal,
)

__all__ = [
    "dec",
    "multi_replace",
    "nullify_tokens",
    "pct",
    "split_part",
    "top1_per_group",
    "try_decimal",
]
