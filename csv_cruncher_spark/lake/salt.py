"""Hot-key (domain) skew handling: histograms, salted joins, salted
two-stage aggregation.

The reference's only answer to slow hot keys was user-declared B-tree
indexes (/root/reference/docs/Indexes.md:5-7, HsqlDbTableCreator.kt:
185-192) — meaningless on Spark. At cluster scale the failure mode is a
skewed shuffle: one task gets the whole ``en.wikipedia.org`` partition and
the stage runs at the speed of that task (SURVEY.md §2.D "hot-key
handling"). Three tools, in preference order:

1. **AQE skew-join** (on by default in session.py): runtime splitting of
   oversized join partitions. Zero code; handles most cases.
2. **Salted join** (here): for EXTREME skew or non-AQE-splittable plans —
   the big side's hot keys are spread over ``salt_buckets`` sub-keys, the
   small side is exploded to match. Deterministic (hash-based salt, no
   rand()) so replays are stable.
3. **Two-stage salted aggregation** (here): only needed for aggregates
   whose partial state is large (collect_list, exact distinct). sum/count/
   max already get map-side partial combine from hash aggregation — do NOT
   salt those, it just adds a shuffle.

The CDC merge itself needs none of this: in-batch LWW is a max_by hash
aggregation (partial combine eats the hot-url skew map-side,
lake/merge.py), and the old×winners join is keyed on the UNIQUE url, so no
key exceeds one row per side. Salting matters for the generic query
surface (joins keyed on domain, groupBys on low-cardinality hot columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def key_histogram(df: DataFrame, key_col: str, top_k: int = 20) -> list[tuple[str, int]]:
    """Top-k key frequencies — the skew probe (drive salt_buckets from
    this). One hash-agg job with partial combine; cheap even when the
    key is hot."""
    rows = (
        df.groupBy(key_col)
        .count()
        .orderBy(F.desc("count"), F.asc(key_col))
        .limit(top_k)
        .collect()
    )
    return [(r[key_col], r["count"]) for r in rows]


def pick_salt_buckets(
    df: DataFrame, key_col: str, target_rows_per_task: int = 5_000_000
) -> int:
    """Heuristic: buckets = ceil(hottest_key_rows / target). 1 = no salt
    needed."""
    hist = key_histogram(df, key_col, top_k=1)
    if not hist:
        return 1
    hottest = hist[0][1]
    return max(1, -(-hottest // target_rows_per_task))


def with_salt(df: DataFrame, salt_buckets: int, from_cols: list[str] | None = None) -> DataFrame:
    """Add a DETERMINISTIC salt in [0, salt_buckets): xxhash64 of
    ``from_cols`` (default: all columns). No rand() — a replayed batch
    salts identically, which exactly-once replay requires
    (SURVEY.md §7.5 trap 5)."""
    cols = from_cols or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))
    )


def explode_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Replicate every row once per salt value (the small/broadcast side
    of a salted join)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` is skewed on the join key(s): big rows get a
    deterministic salt, small rows are replicated ``salt_buckets``×, and
    the join key becomes (keys..., salt) — the hot key's rows now land in
    ``salt_buckets`` shuffle partitions instead of one.

    Cost model: small side grows ``salt_buckets``× — keep it the DIM side.
    Result is bit-identical to ``big.join(small, on, how)`` for the
    supported ``how`` values. right/full outer joins are rejected: the
    exploded small side would emit each unmatched small row
    ``salt_buckets`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side breaks right/full outer semantics (unmatched small "
            f"rows would duplicate salt_buckets times); allowed: {sorted(allowed)}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, salt_buckets)
    s = explode_salt(small, salt_buckets)
    joined = b.join(s, on=keys + [SALT_COL], how=how)
    return joined.drop(SALT_COL)


def salted_two_stage_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage aggregation for decomposable aggregates over skewed keys:
    stage 1 groups by (keys, salt) — hot key spread over salt_buckets
    tasks; stage 2 re-combines per key. ``aggs`` maps column → one of
    sum/count/min/max.

    Only worth it when partial state per key is big or when a downstream
    exact-distinct defeats partial combine; plain sum/count should rely on
    hash aggregation's built-in map-side combine instead.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1 = with_salt(df, salt_buckets, from_cols=df.columns).groupBy(
        *key_cols, SALT_COL
    )
    partials = []
    for col, fn in aggs.items():
        if fn not in recombine:
            raise ValueError(f"Non-decomposable aggregate: {fn}")
        partials.append(getattr(F, fn)(col).alias(f"__p_{fn}_{col}"))
    mid = stage1.agg(*partials)
    finals = [
        recombine[fn](f"__p_{fn}_{col}").alias(f"{fn}_{col}")
        for col, fn in aggs.items()
    ]
    return mid.groupBy(*key_cols).agg(*finals)


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """:func:`key_histogram` as a DataFrame with exact share math — the
    auditable skew report an operator attaches to a pipeline run before
    deciding salting/bucketing: per top-key (rank, key, n, share_micro,
    cum_share_micro). "The top 3 domains hold 80% of the rows" reads
    directly off ``cum_share_micro``.

    Exactness: counts and the cumulative count are int64; each share is
    ONE rounded division by the exact total (micro units), so any
    engine replays the report bit-for-bit. Scale shape: a
    partial-combined count per key (the hot key arrives pre-summed),
    ONE TakeOrdered top-k, and the rank/cumsum window runs on the
    ALREADY-LIMITED ``top_k`` rows — a bounded single partition by
    construction, never a corpus-wide window."""
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__t"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("key"))))
        .withColumn("__cum", F.sum("n").over(w))
        .select(
            "rank",
            "key",
            "n",
            F.round(F.lit(1_000_000.0) * F.col("n") / F.col("__t"))
            .cast("bigint")
            .alias("share_micro"),
            F.round(F.lit(1_000_000.0) * F.col("__cum") / F.col("__t"))
            .cast("bigint")
            .alias("cum_share_micro"),
        )
    )
