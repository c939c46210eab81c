"""Scalar JSON functions with the reference's exact semantics.

The reference registers three HSQLDB Java functions (jsonSubtree, jsonLeaf,
jsonLeaves — /root/reference/src/main/kotlin/cz/dynawest/csvcruncher/util/
SqlFunctions.kt:31-89, registered from Cruncher.kt:112). Their quirks, all
asserted by it/SqlFunctionsTest.kt:22-58 and replicated here:

- ``jsonSubtree``: slash path (``foo/bar``, no array steps), returns the
  subtree RE-SERIALIZED AS JSON — a string scalar keeps its quotes
  (``"bar"``), JSON ``null`` becomes the 4-char text ``null``; a missing
  path returns SQL NULL.
- ``jsonLeaf``: returns the RAW TEXT of a scalar node (string unquoted,
  number verbatim); non-scalar → SQL NULL (or error when
  ``null_on_nonscalar=False``).
- ``jsonLeaves``: for each element of the array at ``path``, extract the
  scalar at the JSON-Pointer-ish ``leaves_subpath``; the reference returns
  a JSON-serialized array STRING only because HSQLDB functions cannot
  return ARRAY (SqlFunctions.kt:61-81 dead code + comment). We return a
  real ``array<string>`` (strictly more powerful); ``json_leaves_text``
  gives the byte-parity serialized form.

All are pure Catalyst expressions over Spark 4's VARIANT type (parse once,
navigate JVM-side, whole-stage codegen) — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def slash_path_to_jsonpath(path: str) -> str:
    """``foo/bar`` → ``$.foo.bar`` (reference paths have no array steps,
    SqlFunctions.kt:104-113 navigates object fields only)."""
    parts = [p for p in path.strip("/").split("/") if p]
    return "$" + "".join(f".{p}" for p in parts)


def _as_variant(json_col: Column | str) -> Column:
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.parse_json(c)


def json_subtree(json_col: Column | str, path: str) -> Column:
    """Subtree at slash ``path``, re-serialized as canonical JSON text.

    Parity: SqlFunctions.kt:98-129 (`"bar"` keeps quotes; JSON null →
    literal ``null`` text; missing path → SQL NULL; bad JSON → error).
    """
    v = F.try_variant_get(_as_variant(json_col), slash_path_to_jsonpath(path), "variant")
    return F.to_json(v)


def _is_scalar_variant(v: Column) -> Column:
    sch = F.schema_of_variant(v)
    return ~(sch.startswith("OBJECT") | sch.startswith("ARRAY"))


def json_leaf(
    json_col: Column | str, path: str, null_on_nonscalar: bool = True
) -> Column:
    """Raw text of the scalar node at slash ``path``.

    Parity: SqlFunctions.kt:131-141 — string unquoted, number verbatim;
    missing → NULL; non-scalar → NULL (flag True) or error (flag False).
    """
    v = F.try_variant_get(_as_variant(json_col), slash_path_to_jsonpath(path), "variant")
    # JSON null is a PRESENT scalar and must render as the 4-char text
    # ``null`` (SqlFunctionsTest.kt:38), distinct from a missing path
    # (SQL NULL). is_variant_null(NULL) is NULL, so the missing case
    # falls through to the cast, which yields SQL NULL as before.
    scalar_text = F.when(F.is_variant_null(v), F.lit("null")).otherwise(
        F.try_variant_get(v, "$", "string")
    )
    if null_on_nonscalar:
        return F.when(v.isNull() | _is_scalar_variant(v), scalar_text)
    return F.when(
        v.isNull() | _is_scalar_variant(v), scalar_text
    ).otherwise(
        F.raise_error(
            F.format_string("Node at path %s is not scalar", F.lit(path))
        )
    )


def json_leaves(
    json_col: Column | str,
    path: str,
    leaves_subpath: str,
    null_on_nonarray: bool = True,
) -> Column:
    """For each element of the array at ``path``, the scalar text at
    ``leaves_subpath`` — returned as a real ``array<string>``.

    Parity: SqlFunctions.kt:143-176 (leavesSubPath is a JSON Pointer there;
    both ``/a/b`` and ``a/b`` accepted here). Non-array at ``path`` → NULL
    (try-cast semantics) or error when ``null_on_nonarray=False``.
    """
    v = _as_variant(json_col)
    node = F.try_variant_get(v, slash_path_to_jsonpath(path), "variant")
    arr = F.try_variant_get(node, "$", "array<variant>")
    sub = slash_path_to_jsonpath(leaves_subpath)
    leaves = F.transform(arr, lambda e: F.try_variant_get(e, sub, "string"))
    if null_on_nonarray:
        return leaves
    return F.when(node.isNotNull() & arr.isNull(), F.raise_error(
        F.format_string("Node at path %s is not an array", F.lit(path))
    )).otherwise(leaves)


def json_leaves_text(
    json_col: Column | str, path: str, leaves_subpath: str
) -> Column:
    """Byte-parity form of the reference's jsonLeaves return value: the
    array JSON-serialized to a string (because HSQLDB functions cannot
    return ARRAY, SqlFunctions.kt:81)."""
    return F.to_json(json_leaves(json_col, path, leaves_subpath))
