"""Structured Streaming analytics over the change stream: watermarked
tumbling-window rollups.

This is the true ``readStream`` path (new-engine surface — the reference
has no streaming at all, SURVEY.md §2.C): a file-source stream over change
batches, event-time windows on ``warc_ts`` with a late-data watermark, and
an append-mode sink. Late events inside the watermark update their window;
events later than the watermark are dropped — the documented,
bounded-state semantics a 10^10-event stream needs (state size is
windows × keys, not events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.StringType()),  # base64 in transit
        T.StructField("lang", T.StringType()),
    ]
)


def read_change_stream(
    spark: SparkSession, batch_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the change-batch directory (schema fixed —
    streaming sources cannot infer)."""
    return (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(batch_dir)
    )


def streaming_hourly_rollup(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Ops per (hour, op) with event-time windowing and late-data bound.

    Watermark = how far event time may lag the stream's max before state
    for a window is finalized and dropped; windows close in append mode
    once the watermark passes their end.
    """
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "approx_urls",
        )
    )


def run_rollup_to_memory(
    spark: SparkSession,
    batch_dir: str,
    table_name: str = "rollup",
    watermark: str = "2 hours",
) -> None:
    """Drive the rollup over everything currently in ``batch_dir`` and
    materialize finalized windows into an in-memory table (test/demo
    harness; production would writeStream to parquet/Kafka)."""
    stream = read_change_stream(spark, batch_dir, max_files_per_trigger=1)
    rollup = streaming_hourly_rollup(stream, watermark=watermark)
    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
