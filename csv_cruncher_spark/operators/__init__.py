from . import dedup, joins, multimodal, similarity, textstats
from .joins import asof_join

__all__ = ["dedup", "joins", "multimodal", "similarity", "textstats", "asof_join"]
