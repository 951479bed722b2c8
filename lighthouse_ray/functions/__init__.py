from . import (
    clustering,
    dedup,
    exchange,
    joins,
    multimodal,
    packing,
    regex_search,
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
    "regex_search",
    "similarity",
    "sketch",
    "textstats",
    "windows",
]
