from . import catalog, ivm, salt
from .ivm import MaintainedAggregate
from .table import LakeTable

__all__ = ["LakeTable", "MaintainedAggregate", "catalog", "ivm", "salt"]
