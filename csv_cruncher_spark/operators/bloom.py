"""Distributed Bloom-filter screening for per-batch admission — the
CDC-ingest shape at 10^10-row corpora: a change batch must be checked
against "have we already ingested this content?", and at 100 TB the
corpus-side anti-join (shuffling the full fingerprint column per batch)
is the dominant cost. A Bloom index amortizes that: build ONCE over the
corpus, reuse across every subsequent batch.

Spark's own Bloom machinery is driver-sided (`DataFrameStatFunctions
.bloomFilter` is JVM-only and materializes the filter on the driver;
the `bloom_filter_agg`/`might_contain` expressions are internal to the
runtime-filter rule, not in the SQL registry), so this implements the
filter as a **DataFrame of set bit positions** — pure relational ops,
no driver-side state, no Python in the hot path:

  build:  corpus key → k = ``n_hashes`` positions via
          ``xxhash64(key, seed_j) pmod n_bits`` → explode → distinct.
          The bits frame is at most ``n_bits`` rows of one long —
          thousands of times smaller than the corpus, broadcastable,
          and writable to parquet as a reusable index artifact
          (re-derivable any time, so losing it costs only a rebuild).
  probe:  batch key → the same k positions → equi-join against the bits
          frame → a key is *maybe-present* iff ALL k positions matched
          (count == k). No corpus access at probe time.

Guarantee: **no false negatives** — every position of a present key is
set by construction, so `maybe_present = false` proves the key is new.
`maybe_present = true` is probabilistic (fpp ≈ (1-e^{-kn/m})^k); confirm
those few against the corpus with an exact join. `bloom_admit` composes
the two: admitted set ≡ the exact anti-join's result (which is why the
driver entry for this operator has a plain-SQL DuckDB oracle), but the
corpus join only ever sees the maybe-present sliver of the batch.

Scale notes: the probe is one broadcast (or small-shuffle) equi-join on
longs; the build is one pass over the corpus with a map-side-combined
distinct. Sizing: n_bits ≈ -n·ln(fpp)/ln(2)² as usual; at 10^10 keys
and 1% fpp that is ~12 GB of set bits as a parquet artifact — large for
a broadcast, fine for a bucketed join, and still 10^4× smaller than
re-scanning a 100 TB corpus per batch.

Reference parity: csv-cruncher has no incremental admission at all
(every import re-reads its inputs); this is new-engine surface for the
north-rule CDC pipeline, companion to dedup.incremental_lsh_pairs
(near-dup screening) — bloom screens *exact* content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """Array of ``n_hashes`` bit positions for ``key`` (JVM xxhash64 per
    seed, codegen'd; pmod keeps positions non-negative)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(j)), F.lit(n_bits)).alias(f"p{j}")
            for j in range(n_hashes)
        ]
    )


def bloom_bits(
    corpus: DataFrame,
    key: str | Column,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Build the Bloom index over ``corpus``: a frame of distinct set bit
    positions (single ``bit`` long column). One corpus pass, map-side
    combined distinct; persist the result to parquet to amortize across
    batches."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        corpus.select(F.explode(_positions(k, n_bits, n_hashes)).alias("bit"))
        .distinct()
    )


def bloom_screen(
    bits: DataFrame,
    batch: DataFrame,
    key: str | Column,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Tag each batch row with ``maybe_present``: true iff all
    ``n_hashes`` positions of its key are set in ``bits``. The join
    touches only (row-id surrogate, position) longs and the bits frame —
    never the corpus. ``n_bits``/``n_hashes`` MUST match the build.

    Plan: explode the batch's positions, left-semi-match them against
    bits via an inner join, count matches per row, compare to k. The
    bits side is small → Spark broadcasts it (AQE does this on size);
    batch rows never shuffle wide payloads because the probe runs on a
    (surrogate, bit) projection joined back by surrogate."""
    k = F.col(key) if isinstance(key, str) else key
    with_id = batch.withColumn("__rid", F.monotonically_increasing_id())
    probes = with_id.select(
        "__rid", F.explode(_positions(k, n_bits, n_hashes)).alias("bit")
    )
    hits = (
        probes.join(bits, "bit", "inner")
        .groupBy("__rid")
        .agg(F.count("*").alias("__hits"))
    )
    return (
        with_id.join(hits, "__rid", "left")
        .withColumn(
            "maybe_present",
            F.coalesce(F.col("__hits"), F.lit(0)) == F.lit(n_hashes),
        )
        .drop("__rid", "__hits")
    )


def bloom_admit(
    corpus: DataFrame,
    batch: DataFrame,
    key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    bits: DataFrame | None = None,
) -> DataFrame:
    """End-to-end admission: rows of ``batch`` whose key is NOT in
    ``corpus``. Bloom-screens first (no corpus access), then exact-
    confirms only the maybe-present sliver with an anti-join — result is
    IDENTICAL to a plain anti-join (no false negatives), which is the
    DuckDB oracle for the driver entry. Pass a prebuilt ``bits`` frame
    (from :func:`bloom_bits`, possibly loaded from parquet) to amortize
    the build across batches; without it the filter is built inline."""
    if bits is None:
        bits = bloom_bits(corpus, key, n_bits, n_hashes)
    screened = bloom_screen(bits, batch, key, n_bits, n_hashes)
    definitely_new = screened.filter(~F.col("maybe_present")).drop("maybe_present")
    suspects = screened.filter(F.col("maybe_present")).drop("maybe_present")
    confirmed_new = suspects.join(corpus.select(key), key, "left_anti")
    return definitely_new.unionByName(confirmed_new)
