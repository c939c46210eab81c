"""One-call corpus construction: the end-to-end pipeline a training-data
user actually runs — quality gate → exact dedup → per-language quota
sampling → train/val/test split — composed from the layer's primitives
(:mod:`textstats`, :mod:`dedup`, :mod:`sampling`) so every stage keeps
its individually-tested semantics.

Every decision is a pure function of row content (token-count gate,
fingerprint-group min-id keeper, hash-threshold sampling/splitting), so
the selected corpus is bit-reproducible across runs, partitionings, and
cluster sizes — and re-derivable in ANSI SQL, which is how the DuckDB
oracle entry checks the whole pipeline, not just each stage.

Scale shape (100 TB): the quality gate and both samplers are narrow
filters fused into the scan (predicate pipelining — rejected docs never
reach a shuffle); dedup is ONE hash-partitioned exchange on the content
fingerprint with keeper election (window min) and the keep-filter in
the same pass — no join back, no second scan of the corpus; the split
label is a projection. Net: exactly one shuffle for the entire
pipeline, and it moves only gate-surviving rows.

The reference has no corpus surface (it stops at SQL over files); this
is the capstone of the beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import sampling, textstats

__all__ = ["build_corpus"]


def build_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
    *,
    min_tokens: int = 1,
    max_tokens: int | None = None,
    quotas: dict[str, float] | None = None,
    default_quota: float = 1.0,
    splits: dict[str, float] | None = None,
    sample_salt: str = "mix-v1",
    split_salt: str = "split-v1",
    near_dup: dict | None = None,
    decontam: dict | None = None,
    temperature: dict | None = None,
) -> DataFrame:
    """Select and label a training corpus. Returns the surviving rows of
    ``df`` plus ``fp`` (content fingerprint) and ``split``.

    Stage order is load-bearing: the quality gate runs FIRST so junk
    never costs a shuffle; dedup runs BEFORE sampling so a document's
    survival cannot depend on which near-identical copy the quota
    happened to keep; the split is assigned LAST but depends only on
    the key, so it would be identical in any order (leakage-safe).

    Dedup keeps the minimum ``id_col`` per normalized-fingerprint group
    (:func:`textstats.normalized_fingerprint` — lowercased,
    punctuation-stripped, whitespace-collapsed), i.e. byte-identical
    *after normalization* collapses. Passing ``near_dup`` (kwargs for
    :func:`csv_cruncher_spark.operators.dedup.dedup`, e.g.
    ``{"min_jaccard": 0.7}``) ALSO collapses near-duplicate groups:
    the iterative pairs→components→keeper pipeline runs on the
    exact-deduped survivors (cheapest order — exact copies never reach
    the shingle mining) and only its keepers proceed to sampling. The
    single-exchange plan promise holds only for the exact-only form;
    near-dup adds the mining/CC shuffles its own entry
    (``dedup_end_to_end``) documents and oracles.

    ``decontam`` (kwargs for
    :func:`csv_cruncher_spark.operators.decontam.decontaminate` minus
    the frames, plus ``"bench"``: the benchmark DataFrame, e.g.
    ``{"bench": eval_df, "n": 13}``) drops benchmark-overlapping docs
    right after the gate — a broadcast anti join, so the plan stays
    corpus-shuffle-free through this stage.

    ``temperature`` (kwargs for
    :func:`csv_cruncher_spark.operators.sampling.temperature_sample`
    minus frame/key/stratum, e.g. ``{"alpha": 0.5, "target_fraction":
    0.6}``) replaces the fixed per-stratum ``quotas`` with the
    n_g^α-flattened mix derived from the DEDUPED survivors' histogram;
    passing both is an error.
    """
    if temperature is not None and quotas:
        raise ValueError("pass either quotas or temperature, not both")
    fp = textstats.normalized_fingerprint(text_col)
    gated = df.withColumn("fp", fp).filter(
        textstats.regex_token_count(text_col) >= F.lit(min_tokens)
    )
    if max_tokens is not None:
        gated = gated.filter(
            textstats.regex_token_count(text_col) <= F.lit(max_tokens)
        )
    if decontam is not None:
        from . import decontam as _decontam

        kw = dict(decontam)
        bench = kw.pop("bench")
        gated = _decontam.decontaminate(
            gated, bench, id_col, text_col, **kw
        )
    # keeper election over the gated set: min id per fingerprint group
    # via an unordered window, so election AND the keep-filter happen in
    # the one pass the fp-shuffle already pays — the agg+join-back
    # alternative (dedup.exact_dedup) would scan the corpus twice and
    # still shuffle the payloads for the join
    kept = (
        gated.withColumn(
            "__keeper", F.min(id_col).over(Window.partitionBy("fp"))
        )
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__keeper")
    )
    if near_dup is not None:
        from . import dedup as _dedup

        labels = _dedup.dedup(kept, id_col, text_col, **near_dup)
        nd_keepers = labels.filter(F.col("is_keeper")).select(
            F.col("id").alias("__nd_id")
        )
        kept = kept.join(
            nd_keepers, kept[id_col] == F.col("__nd_id"), "left_semi"
        )
    if temperature is not None:
        sampled = sampling.temperature_sample(
            kept, id_col, stratum_col, salt=sample_salt, **temperature
        )
    else:
        sampled = sampling.stratified_sample(
            kept,
            id_col,
            stratum_col,
            quotas or {},
            default_fraction=default_quota,
            salt=sample_salt,
        )
    return sampling.assign_split(
        sampled, id_col, splits or {"train": 1.0}, salt=split_salt
    )
