from .json_funcs import (
    json_leaf,
    json_leaves,
    json_leaves_text,
    json_subtree,
    slash_path_to_jsonpath,
)
from .infer import CandidateType, infer_and_cast, infer_column_types
from .scalars import starts_with
from .sql_registry import register_sql_functions
from .urls import normalize_url, surt_key, url_domain, url_host, url_path

__all__ = [
    "json_subtree",
    "json_leaf",
    "json_leaves",
    "json_leaves_text",
    "slash_path_to_jsonpath",
    "CandidateType",
    "infer_column_types",
    "infer_and_cast",
    "starts_with",
    "register_sql_functions",
    "normalize_url",
    "surt_key",
    "url_host",
    "url_path",
    "url_domain",
]
