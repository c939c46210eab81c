"""Keyed op-coded MERGE with last-writer-wins dedup.

Semantics (must match ``cdc.fixtures.reference_fold`` exactly):

1. **In-batch LWW**: for each url keep the event with the max
   ``(warc_ts, row_idx)``. Implemented as ``groupBy(url).agg(max_by(...))``
   — an *aggregation*, not a window. This matters at scale: hash
   aggregation gets map-side partial combine for free, so a hot url whose
   events are spread over 1000 partitions reduces to 1000 partials before
   the shuffle — the skew a ``Window.partitionBy(url)`` would concentrate
   into one task never materializes (SURVEY.md §2.D "hot-key handling";
   salting utilities in lake/salt.py cover the join-side case).
2. **Apply vs table state**: the winner applies iff its ``warc_ts`` is >=
   the current row's ``warc_ts`` (a stale event loses; equal ts → the
   incoming event wins, because replay order makes it the later writer —
   the reference's monotone-counter discipline, Cruncher.kt:342-372).
   ``D`` removes the row, ``I``/``U`` upsert it.
3. **Bucket-scoped copy-on-write**: only buckets containing winner keys are
   read + rewritten; the merge join is an equi-join on url between the old
   rows of those buckets and the (already tiny after dedup) winner set —
   AQE picks broadcast when winners fit, and skew-join splits oversized
   partitions otherwise.

HTML→text extraction runs only on rows that actually get applied (so a
batch that's 90% stale costs 10% of the extraction work).

Reference parity: the op-coded upsert generalizes the DMS-style ``Op``
column of csv-cruncher's own test corpus
(src/test/data/sample-collab/session_telephony_pins, header cited at
it/OptionsCombinationsTest.kt:232-233).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.extract import extract_text_udf
from .table import LakeTable, bucket_expr


def lww_winners(batch_df: DataFrame, key_col: str = "url") -> DataFrame:
    """In-batch LWW dedup via partial-aggregating max_by.

    batch_df must carry ``row_idx`` (a within-batch total order). Returns
    one row per key with the original event columns.
    """
    event_cols = [c for c in batch_df.columns if c != key_col]
    ord_struct = F.struct(F.col("warc_ts"), F.col("row_idx"))
    agg = batch_df.groupBy(key_col).agg(
        F.max_by(F.struct(*[F.col(c) for c in event_cols]), ord_struct).alias("_w")
    )
    return agg.select(key_col, *[F.col(f"_w.{c}").alias(c) for c in event_cols])


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    batch_df: DataFrame,
    epoch_id: int,
    batch_id: str,
    staged_snapshot: dict | None = None,
    fail_after_data_write: bool = False,
) -> dict:
    """Merge one change batch into the table and commit a snapshot.

    batch_df columns: url, warc_ts, html (binary), lang, row_idx
    [, fetch_status...] — extra columns must already exist in the (possibly
    staged) table schema. Returns the committed snapshot.

    ``fail_after_data_write`` injects a crash between data-file write and
    manifest publish — the exactly-once test hook (SURVEY.md §7.5 trap 1).
    """
    snap = staged_snapshot or table.snapshot()
    if any(e["batch"] == batch_id for e in snap["lineage"]):
        return snap  # already applied — exactly-once fence

    key = snap["key_col"]
    n_buckets = snap["n_buckets"]
    schema_version = snap["schema_version"]
    cur_fields = snap["schemas"][str(schema_version)]
    data_cols = [f["name"] for f in cur_fields]

    winners = lww_winners(batch_df, key).withColumn("bucket", bucket_expr(key, n_buckets))
    winners = winners.persist()
    try:
        affected = sorted(
            r["bucket"] for r in winners.select("bucket").distinct().collect()
        )
        if not affected:
            return table.commit([], [], epoch_id, batch_id, staged_snapshot=snap)

        old = table.read(spark, snap=snap, buckets=affected).withColumn(
            "bucket", bucket_expr(key, n_buckets)
        )

        w_cols = [c for c in winners.columns if c not in (key, "bucket")]
        o = old.alias("o")
        w = winners.alias("w")
        joined = o.join(w, on=[F.col(f"o.{key}") == F.col(f"w.{key}")], how="full_outer")

        has_winner = F.col(f"w.{key}").isNotNull()
        has_old = F.col(f"o.{key}").isNotNull()
        # stale: an existing row with strictly newer warc_ts beats the event
        winner_applies = has_winner & (
            ~has_old | F.col("o.warc_ts").isNull() | (F.col("w.warc_ts") >= F.col("o.warc_ts"))
        )

        # surviving old rows: no applicable winner, and not deleted
        keep_old = has_old & (~winner_applies)
        old_rows = joined.filter(keep_old).select(
            *[F.col(f"o.{c}").alias(c) for c in data_cols], F.col("o.bucket").alias("bucket")
        )

        # applied events: I/U upserts (D just disappears)
        applied = joined.filter(winner_applies & (F.col("w.op") != F.lit("D")))
        batch_cols = {
            c for c in w_cols if c not in ("op", "row_idx", "text") and c in data_cols
        }
        type_by_name = {f["name"]: f["type"] for f in cur_fields}
        sel = [F.col(f"w.{key}").alias(key)]
        for c in data_cols:
            if c == key or c == "text":
                continue
            if c in batch_cols:
                sel.append(F.col(f"w.{c}").alias(c))
            else:  # table column the batch doesn't carry (pre-evolution batch)
                from .table import spark_type

                sel.append(F.lit(None).cast(spark_type(type_by_name[c])).alias(c))
        new_rows = applied.select(*sel, F.col("w.bucket").alias("bucket"))
        # extraction only on applied rows (Arrow-batched pandas UDF)
        new_rows = new_rows.withColumn("text", extract_text_udf(F.col("html")))
        new_rows = new_rows.select(*data_cols, "bucket")

        result = old_rows.unionByName(new_rows)
        new_files = table.write_bucket_data(result, schema_version)
        if fail_after_data_write:
            raise RuntimeError("injected crash between data write and manifest publish")

        metrics = dict(snap.get("metrics", {}))
        metrics["last_batch_files"] = len(new_files)
        return table.commit(
            new_files,
            affected,
            epoch_id,
            batch_id,
            staged_snapshot=snap,
            metrics=metrics,
        )
    finally:
        winners.unpersist()
