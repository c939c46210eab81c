from . import dedup, joins, multimodal, similarity, textstats
from .dedup import dropped_buckets, release
from .joins import asof_join

__all__ = [
    "dedup",
    "joins",
    "multimodal",
    "similarity",
    "textstats",
    "asof_join",
    "release",
    "dropped_buckets",
]
