from . import (
    clustering,
    dedup,
    exchange,
    joins,
    multimodal,
    packing,
    similarity,
    sketch,
    textstats,
    windows,
)

__all__ = [
    "clustering",
    "dedup",
    "exchange",
    "joins",
    "multimodal",
    "packing",
    "similarity",
    "sketch",
    "textstats",
    "windows",
]
