"""Sequence packing for training-data preparation: concatenate documents
into a token stream and cut it into fixed-budget chunks (the GPT-style
pack-then-split layout — documents may span a chunk boundary; nothing is
padded, nothing is dropped).

Packing is a PREFIX SCAN — each document's position depends on every
document before it — which is the textbook non-commutative shape that
cannot be a hash aggregate. The scalable form shards the corpus first:
one exchange on the shard key, then an ordered window per shard computes
the running token offset. Shards are independent streams (training
shards/files), so the scan parallelizes across them; pick ``n_shards``
so one shard's metadata fits a partition (the window carries only
(id, n_tokens) — payloads are joined back by the caller if needed).

Determinism: shard assignment and in-shard order are pure functions of
the document id, so the chunk layout is bit-reproducible across runs,
partitionings, and cluster sizes — and re-derivable in ANSI SQL (the
DuckDB oracle entry replays the same window math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["pack_sequences", "chunk_documents"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str | Column,
    budget: int,
    n_shards: int,
    shard: Column | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns the input plus:

      shard         which independent stream the doc belongs to
      start_offset  the doc's first token's offset within its shard
      first_chunk   floor(start_offset / budget)
      last_chunk    the chunk holding the doc's final token (== first
                    for docs shorter than the distance to the boundary;
                    > first when the doc spans; == first for empty docs)

    ``shard`` defaults to ``pmod(id, n_shards)``; pass e.g.
    ``F.pmod(F.xxhash64(id), n)`` when ids are not uniformly spread.
    In-shard order is ascending ``id_col`` — stable under corpus
    APPENDS with increasing ids (existing offsets never change), which
    is what makes packed shards incrementally extensible.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    n_tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("long")
    shard_c = (
        shard
        if shard is not None
        else F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
    ).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("shard", shard_c)
        .withColumn("__n_tok", n_tok)
        .withColumn(
            "start_offset", F.coalesce(F.sum("__n_tok").over(w), F.lit(0))
        )
    )
    first = F.floor(F.col("start_offset") / budget)
    last = F.floor(
        (F.col("start_offset") + F.greatest(F.col("__n_tok"), F.lit(1)) - 1)
        / budget
    )
    return (
        out.withColumn("first_chunk", first)
        .withColumn("last_chunk", last)
        .drop("__n_tok")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
    sep: str = " ",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Cut each document into sliding token windows — the pre-packing
    layout for fixed-context training (and the chunk shape retrieval
    pipelines index): windows of ``size`` whitespace tokens starting
    every ``stride`` tokens (``stride`` defaults to ``size`` =
    non-overlapping; ``stride < size`` overlaps, the RoBERTa-style
    stride trick so no span is ever split across a window boundary
    unseen).

    Unlike :func:`pack_sequences` (which concatenates documents into a
    shard-global stream), chunking is per-document and therefore a PURE
    PROJECTION: tokenize, generate the start grid with ``sequence``,
    ``posexplode`` it, slice — no shuffle, no window, no Python, and the
    row amplification is bounded by ``ceil(n/stride)`` chunks per doc.
    That makes it embarrassingly scale-safe: chunks inherit their
    parent's partition, and Catalyst prunes every untouched column
    before the explode.

    Output: the id, ``chunk_no`` (0-based), ``start_token`` (1-based
    offset of the window's first token), ``n_chunk_tokens`` (== size
    except the final partial window), and ``out_col`` (the window's
    text, reconstructed with ``sep``). Every document emits at least
    one chunk — an empty or NULL text yields a single empty chunk
    rather than silently vanishing (the same no-dropped-ids contract as
    the boilerplate/paragraph rebuilds). Fully SQL-expressible, so the
    driver entry (doc_chunks) has a row-level DuckDB oracle.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if not sep or "\\E" in sep:
        raise ValueError(f"sep must be a non-empty literal without \\E, got {sep!r}")
    # split() takes a Java regex while array_join() is literal — quote
    # the separator so both sides agree for metachar seps like '|'
    toks = F.split(F.col(text_col), "\\Q" + sep + "\\E")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode_outer(starts).alias("chunk_no", "start_token"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_token"), size)
    return base.select(
        F.col(id_col),
        F.coalesce(F.col("chunk_no"), F.lit(0)).cast("long").alias("chunk_no"),
        F.coalesce(F.col("start_token"), F.lit(1))
        .cast("long")
        .alias("start_token"),
        F.coalesce(F.size(chunk), F.lit(0)).cast("long").alias("n_chunk_tokens"),
        F.coalesce(F.array_join(chunk, sep), F.lit("")).alias(out_col),
    )
