from . import catalog, ivm, salt, sketch_view, vocab_view
from .corpus_view import MaintainedCorpus
from .ivm import MaintainedAggregate, MaintainedExtrema
from .sketch_view import MaintainedSketch
from .table import LakeTable
from .vocab_view import MaintainedVocabulary

__all__ = [
    "LakeTable",
    "MaintainedAggregate",
    "MaintainedExtrema",
    "MaintainedCorpus",
    "MaintainedSketch",
    "MaintainedVocabulary",
    "catalog",
    "ivm",
    "salt",
    "sketch_view",
    "vocab_view",
]
