from . import catalog, ivm, salt
from .corpus_view import MaintainedCorpus
from .ivm import MaintainedAggregate
from .table import LakeTable

__all__ = [
    "LakeTable",
    "MaintainedAggregate",
    "MaintainedCorpus",
    "catalog",
    "ivm",
    "salt",
]
