from . import dedup, joins, multimodal, similarity, textstats
from .dedup import dropped_buckets, release
from .joins import asof_join, asof_join_bucketed

__all__ = [
    "dedup",
    "joins",
    "multimodal",
    "similarity",
    "textstats",
    "asof_join",
    "asof_join_bucketed",
    "release",
    "dropped_buckets",
]
