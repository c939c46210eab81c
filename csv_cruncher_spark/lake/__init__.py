from . import catalog, ivm, salt, vocab_view
from .corpus_view import MaintainedCorpus
from .ivm import MaintainedAggregate, MaintainedExtrema
from .table import LakeTable
from .vocab_view import MaintainedVocabulary

__all__ = [
    "LakeTable",
    "MaintainedAggregate",
    "MaintainedExtrema",
    "MaintainedCorpus",
    "MaintainedVocabulary",
    "catalog",
    "ivm",
    "salt",
    "vocab_view",
]
