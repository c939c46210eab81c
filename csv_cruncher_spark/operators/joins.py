"""Temporal join operators Spark lacks natively: as-of join.

The scalable shape (and the one used here) is the UNION-AND-CARRY plan,
not a range join: tag both sides, shuffle ONCE on the key, sort each key's
rows by (time, side-tag), and carry the latest right-side row forward with
a running ``last(..., ignorenulls=True)`` window. Cost is one shuffle +
one per-partition sort — same class as a regular join — and it inherits
AQE skew handling; a naive range-condition join would be O(|L|·|R|) per
key and is exactly the 100-TB trap this avoids.

Reference parity: csv-cruncher/HSQLDB has no as-of join; this is
new-engine surface for event-time workloads (e.g. purchase→view
attribution over the CDC event stream). DuckDB's native ASOF JOIN
provides the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str | None = None,
    right_prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the LATEST right row of the same key with
    ``right.time <= left.time`` (backward as-of; ``strict=True`` makes it
    ``<``). Left rows with no prior right row keep nulls — LEFT as-of.

    Right columns come back prefixed with ``right_prefix`` (key/time cols
    included, so the matched right timestamp is visible).

    Determinism: if several right rows share a key and timestamp, the one
    greatest under the struct ordering of the remaining right columns
    wins — callers wanting a specific tiebreak should pre-dedup the right
    side (one row per key+time), which also matches DuckDB ASOF JOIN
    semantics used as this operator's oracle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rtime = right_time or left_time

    r_payload = [c for c in right.columns if c not in keys]
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    # side tag orders right rows BEFORE left rows at equal timestamps, so
    # an equal-time right row is visible to the left row (<= semantics);
    # strict mode orders left first instead
    r_tag, l_tag = (0, 1) if not strict else (1, 0)

    # a null-time right row can never satisfy l.ts >= r.ts, but Spark's
    # nulls-first ascending sort would place it BEFORE every real row and
    # last(ignorenulls) would carry it as a bogus "earliest" match —
    # exclude it up front (DuckDB ASOF does the same)
    right = right.filter(F.col(rtime).isNotNull())
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(rtime).alias("__t"),
        F.lit(r_tag).alias("__side"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    unioned = r_tagged.unionByName(l_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))

    out_left = [F.col(c) for c in left.columns if c not in keys]
    out_right = [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in r_payload
    ]
    is_left = F.col("__side") == F.lit(l_tag)
    return carried.filter(is_left).select(*[F.col(k) for k in keys], *out_left, *out_right)
