"""One-call training-curriculum layout: quality score → per-stratum
percentile selection → per-source cap → sequence packing → epoch
shuffle — the order-and-layout half of corpus preparation, composing
with :func:`csv_cruncher_spark.operators.corpus.build_corpus` (the
SELECTION half: gate/decontam/dedup/quota/split) the way a production
pipeline chains them: build_corpus decides WHAT trains, build_curriculum
decides WHERE each survivor sits in the packed, shuffled token stream.

Every stage is an existing operator with its scale shape already pinned
(percentile: one partial-combined aggregate + broadcast threshold join;
cap: payload-free narrow window + semi-join; packing: sharded prefix
scan; shuffle: sharded permutation with histogram offsets — never a
global sort anywhere), and every stage is deterministic and
ANSI-SQL-expressible, so the composed result is row-level DuckDB-oracled
end-to-end in the driver contract (``curriculum_docs``).

Reference parity: csv-cruncher has no corpus operators; this is
new-engine surface for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import textstats
from .packing import pack_sequences
from .ranking import cap_per_group, percentile_filter
from .shuffle import epoch_shuffle

__all__ = ["build_curriculum"]


def build_curriculum(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    stratum_col: str | None = None,
    source_col: str | None = None,
    keep_fraction: float = 0.5,
    cap_k: int | None = None,
    budget: int = 2048,
    n_shards: int = 8,
    epoch: int = 1,
    shuffle_shards: int = 256,
    score: Column | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-document curriculum coordinates for the selected corpus:

      score          the quality score used (default: regex token count)
      pack_shard     packing stream (pmod(id, n_shards))
      start_offset   first-token offset within the pack shard
      first_chunk /
      last_chunk     budget-sized chunk range the doc occupies
      shuffle_shard  epoch-permutation stream
      pos_in_shard   1-based rank within the shuffle shard
      global_pos     0-based position in the full epoch order

    Selection: keep each ``stratum_col`` group's top ``keep_fraction``
    by ``score`` (ties at the threshold kept; ``approx=True`` for the
    bounded-sketch percentile at unbounded score cardinality), then at
    most ``cap_k`` docs per ``source_col`` (omit to skip). Packing uses
    the REAL token count regardless of the quality score — chunk
    geometry must reflect tokens, not quality.

    One selection is shared by the packing and shuffle branches: the
    narrow filtered frame is persisted and registered on the returned
    frame — call :func:`csv_cruncher_spark.operators.dedup.release` on
    the result after your consuming action to free executor memory (the
    codebase's _pin contract; the bench's per-rep ``clearCache`` covers
    it there)."""
    from .dedup import _pin

    n_tok = textstats.regex_token_count(text_col).cast("long")
    # a user-supplied score keeps ITS OWN type — casting a fractional
    # quality signal (avg_logprob, importance weight, [0,1] model score)
    # to long would truncate every value to 0 and void the percentile
    scored = df.withColumn("score", score if score is not None else n_tok)
    kept = percentile_filter(
        scored, "score", keep_fraction, stratum_col=stratum_col, approx=approx
    )
    if cap_k is not None:
        if source_col is None:
            raise ValueError("cap_k needs source_col")
        kept = cap_per_group(kept, source_col, cap_k, id_col)
    # the survivor set feeds packing, shuffling, and the final join —
    # narrow it first (the windows and joins must never carry text)
    narrow_cols = [id_col, "score"] + (
        [stratum_col] if stratum_col is not None else []
    )
    base = kept.select(*narrow_cols, n_tok.alias("__n_tok"))
    # persist BEFORE epoch_shuffle: its global-position histogram is a
    # bounded collect that would otherwise run the whole selection once
    # eagerly and again at the consuming action (_pin's persist below is
    # the registered release point; re-persisting is a no-op)
    base.persist()
    packed = pack_sequences(
        base.select(id_col, "__n_tok"), id_col, "__n_tok", budget, n_shards
    ).select(
        id_col,
        F.col("shard").alias("pack_shard"),
        "start_offset",
        "first_chunk",
        "last_chunk",
    )
    shuffled = epoch_shuffle(
        base.select(id_col), id_col, epoch=epoch, n_shards=shuffle_shards
    ).select(
        id_col,
        F.col("shard").alias("shuffle_shard"),
        "pos_in_shard",
        "global_pos",
    )
    out = (
        base.drop("__n_tok").join(packed, id_col).join(shuffled, id_col)
    )
    return _pin(base, out)
