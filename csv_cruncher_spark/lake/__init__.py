from . import catalog, ivm, links_view, salt, scd_view, sketch_view, vocab_view, zorder
from .corpus_view import MaintainedCorpus
from .ivm import MaintainedAggregate, MaintainedExtrema
from .links_view import MaintainedLinkGraph
from .scd_view import MaintainedScd2
from .sketch_view import MaintainedSketch
from .table import LakeTable
from .vocab_view import MaintainedVocabulary

__all__ = [
    "LakeTable",
    "MaintainedAggregate",
    "MaintainedExtrema",
    "MaintainedCorpus",
    "MaintainedLinkGraph",
    "MaintainedScd2",
    "MaintainedSketch",
    "MaintainedVocabulary",
    "catalog",
    "ivm",
    "links_view",
    "salt",
    "scd_view",
    "sketch_view",
    "vocab_view",
    "zorder",
]
