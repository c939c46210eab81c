"""JSON source with the reference's flattening semantics (operator A19).

The reference tabularizes JSON in two streaming passes (navigate to the
items array at ``-itemsAt``, flatten nested objects to dot-joined names,
union all property names across records, arrays collapsed to a ``[...]``/
``[]`` stub) — /root/reference/src/main/kotlin/cz/dynawest/csvcruncher/
converters/json/JsonFileFlattener.kt:25-129, stub :116, dotted names
:117-121; CsvExporter.kt:18-38 (missing property → empty cell).

Spark-first realization: ``spark.read.json`` already does the two-pass
union-of-schemas inference distributed across executors; the flattening is
a single Catalyst projection (no UDF, no extra pass). The reference's
array STUB exists only because CSV cells can't hold arrays — we default to
serializing real arrays with ``to_json`` (lossless) and offer
``array_mode="stub"`` for byte parity with JsonFileFlattener.kt:116.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _navigate_items_at(df: DataFrame, items_at: str) -> DataFrame:
    """Walk the ``-itemsAt`` slash path (JsonFileFlattener.kt:78-98):
    struct steps are field selections; the final array is exploded into
    one row per item."""
    steps = [s for s in items_at.strip("/").split("/") if s]
    cur = df
    path: list[str] = []
    for step in steps:
        path.append(step)
        dotted = ".".join(f"`{p}`" for p in path)
        field: T.DataType = cur.select(F.col(dotted)).schema.fields[0].dataType
        if isinstance(field, T.ArrayType):
            cur = cur.select(F.explode(F.col(dotted)).alias("_item"))
            path = ["_item"]
    if path == ["_item"]:
        elem = cur.schema["_item"].dataType
        if not isinstance(elem, T.StructType):
            raise ValueError(f"itemsAt {items_at!r} does not point at an array of objects")
        return cur.select("_item.*")
    dotted = ".".join(f"`{p}`" for p in path)
    final = cur.select(F.col(dotted)).schema.fields[0].dataType
    if isinstance(final, T.StructType):
        return cur.select(f"{dotted}.*")
    raise ValueError(f"itemsAt {items_at!r} does not point at an array or object")


def flatten_columns(df: DataFrame, array_mode: str = "json") -> DataFrame:
    """Flatten nested structs to dot-joined top-level column names
    (``address.city`` — literal dots in the name, backtick-quoted in SQL,
    JsonFileFlattener.kt:117-121). Arrays: ``json`` → to_json string
    (lossless); ``stub`` → ``[...]``/``[]`` parity with
    JsonFileFlattener.kt:116; ``keep`` → native ArrayType column.
    """
    sel: list[F.Column] = []

    def walk(prefix: list[str], dt: T.DataType) -> None:
        qualified = ".".join(f"`{p}`" for p in prefix)
        name = ".".join(prefix)
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(prefix + [f.name], f.dataType)
        elif isinstance(dt, T.ArrayType):
            if array_mode == "stub":
                sel.append(
                    F.when(F.col(qualified).isNull(), F.lit(None).cast("string"))
                    .when(F.size(F.col(qualified)) == 0, F.lit("[]"))
                    .otherwise(F.lit("[...]"))
                    .alias(name)
                )
            elif array_mode == "json":
                sel.append(F.to_json(F.col(qualified)).alias(name))
            else:
                sel.append(F.col(qualified).alias(name))
        else:
            sel.append(F.col(qualified).alias(name))

    for f in df.schema.fields:
        walk([f.name], f.dataType)
    return df.select(*sel)


def read_json_flat(
    spark: SparkSession,
    paths: str | list[str],
    items_at: str = "/",
    array_mode: str = "json",
    multi_line: bool | None = None,
) -> DataFrame:
    """Read JSON file(s) → flattened tabular DataFrame.

    ``multi_line=None`` auto-selects: an ``items_at`` path below the root
    implies one big document (multiLine), otherwise JSON-Lines first with
    a multiLine retry for array-at-root documents.
    """
    if multi_line is None:
        multi_line = items_at not in ("", "/")
    df = spark.read.option("multiLine", multi_line).json(paths)
    if not multi_line and df.columns == ["_corrupt_record"]:
        df = spark.read.option("multiLine", True).json(paths)
    if items_at not in ("", "/"):
        df = _navigate_items_at(df, items_at)
    if "_corrupt_record" in df.columns:
        raise ValueError(f"Malformed JSON input in {paths}")
    return flatten_columns(df, array_mode=array_mode)
