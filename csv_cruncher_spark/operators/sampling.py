"""Deterministic hash-based sampling and dataset splitting — the
training-data mixing primitives (per-language/per-source quotas, fixed
train/val/test assignment) a 100 TB corpus pipeline needs.

Why not ``df.sample()``: Spark's native sampler draws from a per-partition
RNG, so the selected rows change whenever partitioning, parallelism, or
the seed's task mapping changes — a re-run on a different cluster layout
yields a DIFFERENT sample, which is unacceptable for reproducible corpus
construction. Hashing the stable business key instead makes membership a
pure function of the row: the same document lands in the same
sample/split on every run, at every scale, on any engine (the DuckDB
oracle entry re-derives the exact row set from the same md5 math).

Mechanism: ``u = substr(md5(key || ':' || salt), 1, 8)`` is 8 lowercase
hex chars — uniform over [0, 2^32) — and fixed-width lowercase hex
compares lexicographically exactly like the integer it encodes, so
``u < format(floor(f * 2^32), '08x')`` keeps an f-fraction. Everything
is built-in JVM expressions (md5/substring/CASE): a pure narrow
projection+filter — no shuffle, no UDF, no driver state; stratum quotas
are a literal ``map`` lookup, not a join. Changing ``salt`` redraws an
independent sample; reusing a salt reproduces it bit-for-bit.

The reference has no sampling surface at all (closest is LIMIT in
delegated SQL, /root/reference/docs/Features.md); this is part of the
beyond-reference training-data layer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_sample",
    "assign_split",
    "temperature_fractions",
    "temperature_sample",
    "weighted_sample_topk",
]


def _hex_threshold(fraction: float) -> str:
    """Keep-threshold for the 8-hex uniform draw. ``"g"`` sorts after
    every hex string (keep-all); ``""`` sorts before (keep-none)."""
    if fraction <= 0.0:
        return ""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 2**32), "08x")


def hash_bucket(key: Column, salt: str) -> Column:
    """The 8-hex-char uniform draw for ``key`` under ``salt`` (lowercase;
    compares like the uint32 it encodes). Exposed so callers can bucket
    on the same stream the samplers use (e.g. sharding, A/B cohorts)."""
    return F.substring(
        F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 8
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Same key +
    same salt → same decision, independent of partitioning, cluster
    size, or row order."""
    return df.filter(
        hash_bucket(F.col(key_col), salt) < F.lit(_hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing operator
    ("keep 50% of English, 10% of everything else"). The stratum →
    threshold table is a literal ``map`` expression, so the plan stays a
    single narrow filter regardless of how many strata are configured
    (no broadcast join, nothing to skew)."""
    if not fractions:
        return hash_sample(df, key_col, default_fraction, salt)
    pairs: list[Column] = []
    for stratum, frac in sorted(fractions.items()):
        pairs += [F.lit(stratum), F.lit(_hex_threshold(frac))]
    thr = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(_hex_threshold(default_fraction)),
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def temperature_fractions(
    counts: dict[str, int],
    alpha: float = 0.5,
    target_fraction: float | None = None,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-stratum keep fractions for temperature sampling (the
    multilingual mixing rule of mT5/XLM-R): sampling probability
    ``p_g ∝ n_g^alpha``, so ``alpha < 1`` flattens the distribution —
    low-resource strata keep a larger share of themselves than dominant
    ones. The target size is ``target_rows`` (or ``target_fraction`` of
    the total); each stratum's fraction is ``min(1, target·p_g / n_g)``,
    clipped per stratum (small strata that would need upsampling cap at
    keep-all — this operator mixes down, it does not duplicate rows).

    Fractions are rounded to 6 decimals: quantizing at 1e-6 makes the
    realized rates printable/configurable AND absorbs last-ulp libm
    differences so an external engine (the DuckDB oracle) re-deriving
    them from the same counts lands on the identical threshold.
    ``alpha=0.5`` uses ``sqrt`` — IEEE-correctly-rounded in every
    engine, unlike ``pow``."""
    if (target_fraction is None) == (target_rows is None):
        raise ValueError("pass exactly one of target_fraction / target_rows")
    if not counts:
        return {}
    total = sum(counts.values())
    target = float(target_rows) if target_rows is not None else total * target_fraction
    weight = {
        s: (math.sqrt(n) if alpha == 0.5 else float(n) ** alpha)
        for s, n in counts.items()
    }
    denom = sum(weight[s] for s in sorted(weight))
    return {
        s: round(min(1.0, target * (weight[s] / denom) / counts[s]), 6)
        for s in sorted(counts)
    }


def temperature_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    target_fraction: float | None = None,
    target_rows: int | None = None,
    salt: str = "temp-v1",
) -> DataFrame:
    """Deterministic temperature-mixed corpus: derive per-stratum keep
    fractions from the stratum histogram (``n_g^alpha`` flattening, see
    :func:`temperature_fractions`) and apply them with
    :func:`stratified_sample`. The histogram collect is bounded by the
    number of strata (languages/domains — dozens, never rows), and the
    applied plan is the same single narrow literal-map filter as every
    sampler here: no join, no shuffle, layout-independent membership."""
    hist = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(stratum_col).alias("__s"))
        .agg(F.count("*").alias("__n"))
        .collect()
    }
    # a NULL stratum is a stratum: it participates in the n_g^alpha math
    # like any other (under a sentinel name, since the fraction dict is
    # sorted), and its fraction is applied through stratified_sample's
    # default (the literal-map lookup yields null exactly for the NULL
    # rows — every non-null stratum has an explicit entry)
    null_n = hist.pop(None, 0)
    sentinel = "\x00null-stratum"
    counts = dict(hist)
    if null_n:
        counts[sentinel] = null_n
    fracs = temperature_fractions(counts, alpha, target_fraction, target_rows)
    null_frac = fracs.pop(sentinel, 0.0)
    return stratified_sample(df, key_col, stratum_col, fracs, null_frac, salt)


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint dataset splits (train/val/test): partition
    the hash space by cumulative weight and label each row with the
    range its draw falls in. Every row gets exactly one label; weights
    are normalized, so {"train": 9, "val": 0.5, "test": 0.5} works. A
    key's split never changes across runs or data growth — documents
    added later cannot migrate existing keys between train and test
    (leakage-safe by construction)."""
    if not weights:
        raise ValueError("assign_split needs at least one split weight")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"split weights must sum > 0, got {weights}")
    u = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "wsample-v1",
    key_out: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    every row gets the score  u^(1/w)  for a uniform draw u and weight
    w, and the k highest scores ARE a weighted sample without
    replacement. Ranking by ``u^(1/w)`` is order-equivalent to ranking
    by ``ln(u)/w``, which is what's computed (no pow, no overflow, no
    underflow at large weights).

    Everything is derived from the module's salted md5 stream, so the
    sample is a pure function of (key, salt): layout-independent,
    replayable, and append-stable in the E-S sense (a new row displaces
    the current minimum only if its own score wins — exactly the
    reservoir semantics, evaluated batch-side). Weights must be POSITIVE
    integers (token counts, byte sizes, quality micro-scores);
    rows with NULL or non-positive weight are excluded (E-S is undefined
    there), matching the oracle's filter.

    Cross-engine exactness: the uniform draw is the 8-hex md5 prefix as
    a uint32 v; ``ln((v + 0.5)/2^32)`` is rounded ONCE to int64 micro
    units, and the ranking key is the single IEEE division
    ``lnu_micro / w`` — identical doubles in any engine, ties broken by
    key ascending. Scale shape: a narrow projection plus ONE
    TakeOrdered top-k (per-partition heaps of k, no global sort
    shuffle); keep k small relative to executor memory — for
    corpus-sized k use the threshold form (rank once, filter) instead.

    Returns the selected rows with all original columns, plus the E-S
    key as ``key_out`` when requested.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = (
        F.col(weight_col).cast("long")
        if isinstance(weight_col, str)
        else weight_col.cast("long")
    )
    v = F.conv(hash_bucket(F.col(key_col), salt), 16, 10).cast("long")
    lnu = F.round(
        F.log((v + F.lit(0.5)) / F.lit(4294967296.0)) * 1_000_000
    ).cast("bigint")
    out = (
        df.withColumn("__w", w)
        .filter(F.col("__w") > 0)
        .withColumn("__es", lnu / F.col("__w"))
        .orderBy(F.desc("__es"), F.col(key_col).asc())
        .limit(k)
    )
    if key_out is not None:
        out = out.withColumn(key_out, F.col("__es"))
    return out.drop("__w", "__es")
