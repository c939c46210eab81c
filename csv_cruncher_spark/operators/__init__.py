from . import (
    bloom,
    boilerplate,
    corpus,
    decontam,
    dedup,
    joins,
    multimodal,
    packing,
    ranking,
    sampling,
    shuffle,
    similarity,
    textstats,
)
from .boilerplate import boilerplate_lines, remove_boilerplate_lines
from .corpus import build_corpus
from .decontam import contamination_report, decontaminate
from .packing import pack_sequences
from .ranking import cap_per_group, percentile_filter
from .sampling import (
    assign_split,
    hash_sample,
    stratified_sample,
    temperature_fractions,
    temperature_sample,
)
from .dedup import dropped_buckets, release
from .shuffle import epoch_shuffle
from .joins import asof_join, asof_join_bucketed, interval_join

__all__ = [
    "bloom",
    "boilerplate",
    "boilerplate_lines",
    "remove_boilerplate_lines",
    "corpus",
    "decontam",
    "packing",
    "ranking",
    "percentile_filter",
    "cap_per_group",
    "sampling",
    "shuffle",
    "epoch_shuffle",
    "build_corpus",
    "contamination_report",
    "decontaminate",
    "pack_sequences",
    "hash_sample",
    "stratified_sample",
    "assign_split",
    "temperature_fractions",
    "temperature_sample",
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
