from . import bloom, dedup, joins, multimodal, similarity, textstats
from .dedup import dropped_buckets, release
from .joins import asof_join, asof_join_bucketed, interval_join

__all__ = [
    "bloom",
    "dedup",
    "joins",
    "multimodal",
    "similarity",
    "textstats",
    "asof_join",
    "asof_join_bucketed",
    "interval_join",
    "release",
    "dropped_buckets",
]
