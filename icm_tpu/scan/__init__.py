from .zigzag import (
    zigzag_order,
    inverse_order,
    zigzag_split,
    zigzag_merge,
    zigzag_split_tokens,
)

__all__ = [
    "zigzag_order",
    "inverse_order",
    "zigzag_split",
    "zigzag_merge",
    "zigzag_split_tokens",
]
