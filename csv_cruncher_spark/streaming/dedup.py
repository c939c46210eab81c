"""Streaming dedup of re-delivered change events — the at-least-once →
effectively-once bridge on the ingest edge.

A CDC transport (log shipper, Kafka, file mover) re-delivers: the same
(url, warc_ts) change event can arrive again seconds or minutes later
in a different micro-batch. Downstream LWW is idempotent to exact
replays, but re-delivered events still cost full merge work per copy —
dropping them at the stream edge is cheaper than absorbing them in the
table.

Spark's native operator is ``dropDuplicatesWithinWatermark``: state
keeps one entry per key only until the event-time watermark passes it,
so state is O(keys-in-window), not O(all keys ever) — the bounded-state
requirement at 10^10 events. The trade is the same as any watermark: a
duplicate arriving LATER than the watermark delay is not caught (and
falls through to the idempotent LWW merge, so correctness holds — the
stream dedup is a cost optimization with a bounded-state guarantee, not
the correctness fence; the exactly-once fence stays in the snapshot
commit).

Reference parity: none — csv-cruncher has no streaming; this is
new-engine surface alongside streaming/rollup.py and stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .rollup import read_change_stream


def dedup_change_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("url", "warc_ts"),
    event_time: str = "warc_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop re-delivered events whose ``id_cols`` key was already seen
    within the event-time ``watermark``. First arrival wins and is
    emitted exactly once; state for a key is freed once the watermark
    passes its event time."""
    return events.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def run_dedup_to_memory(
    spark: SparkSession,
    batch_dir: str,
    table_name: str = "deduped",
    watermark: str = "2 hours",
) -> None:
    """Drive the stream dedup over everything currently in ``batch_dir``
    into an in-memory table (test/demo harness; production would
    writeStream into the CDC pipeline's staging dir or Kafka)."""
    stream = read_change_stream(spark, batch_dir, max_files_per_trigger=1)
    deduped = dedup_change_stream(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
