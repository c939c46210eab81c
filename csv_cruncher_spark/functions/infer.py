"""Whole-column trial-cast type inference (the reference's SqlTypeReducer).

The reference loads every CSV column as VARCHAR(4092) then narrows it by
probing an ordered candidate ladder ``TIMESTAMP, UUID, DECIMAL(14,6),
DECIMAL(10,3), DECIMAL(2,2), BIGINT, INTEGER, SMALLINT, BOOLEAN`` against
the whole column; any failing row disqualifies the candidate and the LAST
candidate that fits wins (/root/reference/src/main/kotlin/cz/dynawest/
csvcruncher/util/SqlTypeReducer.kt:16-106, ladder :28, probe :32-42).

Spark-first realization: instead of one probe QUERY per (column, candidate)
like the reference (9 full scans per column), ALL probes run in a SINGLE
aggregation pass — one job, one scan, map-side partial aggregation, no
shuffle beyond the final 1-row reduce. At 100 TB this is the difference
between 9×C scans and exactly one.

Semantic notes (parity with the reference's observable behavior, tested by
it/BooleanColumnDetectionTest.kt:42-71 on src/test/data/boolTable.csv):
- BOOLEAN fits only literal ``true/false`` (any case). ``yes/no``, ``y/n``
  stay string and ``0/1`` narrows to SMALLINT, because the reference's
  round-trip check re-serializes HSQLDB booleans as ``TRUE/FALSE`` which
  prefix-matches only true/false input text. Spark's own boolean cast
  accepts y/n/0/1, so the probe constrains it explicitly.
- UUID is a logical type: Spark has no UUID, so a column that matches the
  UUID shape keeps StringType physically but is reported as ``uuid``
  (SURVEY.md §1.4 maps UUID → string).
- NULL/empty cells never disqualify a candidate (HSQLDB casts NULL to any
  type); an all-null column stays string.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class CandidateType:
    name: str            # ladder name, e.g. "DECIMAL(14,6)"
    spark_type: str | None  # cast target DDL; None = keep string (logical only)


_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
_TS_RE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"

# ladder order = SqlTypeReducer.kt:28; LAST fitting candidate wins
LADDER: list[CandidateType] = [
    CandidateType("TIMESTAMP", "timestamp"),
    CandidateType("UUID", None),
    CandidateType("DECIMAL(14,6)", "decimal(14,6)"),
    CandidateType("DECIMAL(10,3)", "decimal(10,3)"),
    CandidateType("DECIMAL(2,2)", "decimal(2,2)"),
    CandidateType("BIGINT", "bigint"),
    CandidateType("INTEGER", "int"),
    CandidateType("SMALLINT", "smallint"),
    CandidateType("BOOLEAN", "boolean"),
]
_BY_NAME = {c.name: c for c in LADDER}


def _fails(col: F.Column, cand: CandidateType) -> F.Column:
    """True when this non-null value disqualifies the candidate."""
    if cand.name == "UUID":
        return ~col.rlike(_UUID_RE)
    if cand.name == "BOOLEAN":
        return ~F.lower(col).isin("true", "false")
    if cand.name == "TIMESTAMP":
        # try_cast alone accepts shapes like bare years; anchor to the
        # date-time shapes HSQLDB's TIMESTAMP parser accepts
        return ~col.rlike(_TS_RE) | col.try_cast("timestamp").isNull()
    fail = col.try_cast(cand.spark_type).isNull()
    if cand.name.startswith("DECIMAL") or cand.name in ("BIGINT", "INTEGER", "SMALLINT"):
        # numeric candidates must look numeric (reject e.g. leading '+inf')
        fail = fail | ~col.rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
    return fail


def infer_column_types(
    df: DataFrame, columns: list[str] | None = None
) -> dict[str, str | None]:
    """One-pass whole-column probe. Returns {column: ladder_name|None}
    (None = no candidate fits / all-null → stay string)."""
    cols = columns if columns is not None else [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if not cols:
        return {}
    aggs: list[F.Column] = []
    for c in cols:
        # df[c] resolves by EXACT name — F.col(c) would parse a dotted
        # header like "first.name" as nested-field access and crash
        col = df[c]
        aggs.append(
            F.sum(F.when(col.isNotNull(), 1).otherwise(0)).alias(f"__nn__{c}")
        )
        for cand in LADDER:
            aggs.append(
                F.sum(
                    F.when(col.isNotNull() & _fails(col, cand), 1).otherwise(0)
                ).alias(f"__f__{c}__{cand.name}")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, str | None] = {}
    for c in cols:
        if not row[f"__nn__{c}"]:
            out[c] = None
            continue
        chosen = None
        for cand in LADDER:  # last fitting wins (SqlTypeReducer.kt:44-50)
            if row[f"__f__{c}__{cand.name}"] == 0:
                chosen = cand.name
        out[c] = chosen
    return out


def infer_and_cast(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Probe then apply the winning casts in a single projection (the
    reference's ALTER TABLE ... SET DATA TYPE step, SqlTypeReducer.kt:70-78,
    becomes a zero-copy Catalyst cast)."""
    decided = infer_column_types(df, columns)
    sel = []
    for f in df.schema.fields:
        name = decided.get(f.name)
        cand = _BY_NAME.get(name) if name else None
        if cand is not None and cand.spark_type is not None:
            sel.append(df[f.name].cast(cand.spark_type).alias(f.name))
        else:
            sel.append(df[f.name])
    return df.select(*sel)
