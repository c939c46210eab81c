"""Percentile-threshold selection: "keep the top q fraction by score
(per stratum)" — the quality-curriculum filter a training pipeline runs
after scoring documents (length/repetition/classifier score), e.g.
keep the best half of every language.

Scale shape: the naive form is a ``percent_rank`` window per stratum —
a full sort of every stratum's rows. This implementation instead
computes the per-stratum score threshold with ONE partial-combined
``percentile`` aggregate (exact, no sort of the corpus — Spark's
percentile aggregates per-partition state), broadcasts the tiny
(stratum, threshold) frame back, and filters. The corpus is scanned
twice but never sorted and never shuffled; ties AT the threshold are
kept (``>=``), so the realized fraction can slightly exceed ``q`` when
the boundary value repeats — deterministic, layout-independent, and the
honest semantics for discrete scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .sampling import hash_bucket

__all__ = [
    "percentile_filter",
    "cap_per_group",
    "token_budget_filter",
    "quantile_buckets",
    "global_rank",
]


def _reject_sortorder(order: Column | None) -> None:
    """Shared guard of the two narrow-frame quota operators
    (:func:`cap_per_group`, :func:`token_budget_filter`): a
    SortOrder-wrapping Column (``F.desc(...)``/``.asc()``) cannot be
    PROJECTED into the narrow frame — execution would die later with a
    codegen INTERNAL_ERROR — so reject it up front with a pointer to the
    ``descending`` flag. Detection inspects the column's underlying node
    class where the runtime exposes it (classic py4j — exact, no false
    positives on a column literally named ``"a DESC b"``), falling back
    to the rendering heuristic elsewhere."""
    if order is None:
        return
    try:
        is_sort = order._jc.node().getClass().getSimpleName() == "SortOrder"
    except Exception:
        s = str(order)
        is_sort = " DESC" in s or " ASC" in s
    if is_sort:
        raise ValueError(
            "order must be a plain value expression (it is projected into "
            "the narrow frame); pass order=F.col(...) with descending=True "
            f"instead of a SortOrder like {order}"
        )


def _with_thresholds(df: DataFrame, pct, stratum_col: str | None, thr_name: str) -> DataFrame:
    """Shared threshold plumbing of :func:`percentile_filter` and
    :func:`quantile_buckets`: ONE partial-combined percentile aggregate
    (``pct`` builds the aggregate expression over the staged
    ``__score``), broadcast back onto every row. Per-stratum mode joins
    null-SAFELY — groupBy computes a threshold for the NULL stratum,
    and a plain equi-join would silently drop every NULL-stratum row no
    matter its score."""
    if stratum_col is None:
        thr = df.agg(pct("__score").alias(thr_name))
        return df.join(F.broadcast(thr))
    thr = df.groupBy(F.col(stratum_col).alias("__stratum")).agg(
        pct("__score").alias(thr_name)
    )
    return df.join(
        F.broadcast(thr),
        F.col(stratum_col).eqNullSafe(F.col("__stratum")),
    ).drop("__stratum")


def percentile_filter(
    df: DataFrame,
    score: str | Column,
    keep_fraction: float,
    stratum_col: str | None = None,
    threshold_out: str | None = None,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Rows whose ``score`` is at or above the per-stratum
    ``(1 - keep_fraction)`` percentile. With ``stratum_col=None`` one
    global threshold applies. Pass ``threshold_out`` to keep the applied
    threshold as a column.

    ``approx=False`` (default) uses the exact interpolated percentile —
    its aggregation state is a per-group map of distinct score values,
    the one unbounded piece of state in the corpus layer when scores are
    continuous. ``approx=True`` swaps in ``percentile_approx`` (bounded
    KLL-style sketch, state O(accuracy) regardless of cardinality — the
    100-TB-continuous-score posture); rank error ≤ 1/accuracy, so the
    realized kept fraction is within ~``1/accuracy`` of ``q`` (property-
    tested in tests/test_ranking.py)."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    score_c = F.col(score) if isinstance(score, str) else score
    p = 1.0 - keep_fraction

    def _pct(col: str) -> Column:
        if approx:
            return F.percentile_approx(col, p, accuracy)
        return F.percentile(col, p)

    df = df.withColumn("__score", score_c)
    out = _with_thresholds(df, _pct, stratum_col, "__thr")
    out = out.filter(F.col("__score") >= F.col("__thr"))
    if threshold_out is not None:
        out = out.withColumn(threshold_out, F.col("__thr"))
    return out.drop("__score", "__thr")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    order: Column | None = None,
    salt: str = "cap-v1",
    descending: bool = False,
) -> DataFrame:
    """At most ``k`` rows per group — the C4/Gopher-style per-domain cap
    that stops a handful of giant hosts from dominating a web corpus.

    Which ``k`` survive: the first by ``order`` (a PROJECTABLE value
    expression — direction lives in ``descending``, so "best quality
    first" is ``order=F.col("quality"), descending=True``; negating the
    column instead breaks on string types) with the id as the ascending
    tiebreak; with no ``order`` the pick is a deterministic hash-random
    draw (epoch-salted md5 of the id — layout-independent and
    re-derivable in SQL, unlike a ``rand()`` sample).

    Scale shape: the ``row_number`` window runs over a PROJECTED
    (group, order, id) frame — no payload column (document text!) rides
    the skewed-group exchange or the per-group sort — and survivors
    rejoin the full frame with a semi-join on the id, which shuffles the
    payload by the UNIFORM id key, never by the hot group (round-4
    verdict: the old code windowed the whole frame, serializing a giant
    domain's entire payload through one window task). ``id_col`` must be
    unique and NON-NULL (it is the null-unsafe join-back key: a NULL-id
    row is dropped from the output — filter or synthesize ids first).
    Appends with new ids CAN displace
    previously-kept rows (a cap is a competition, not a sample; use
    :func:`~csv_cruncher_spark.operators.sampling.hash_sample` when
    stability under growth matters more than an exact cap)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _reject_sortorder(order)
    order_c = order if order is not None else hash_bucket(F.col(id_col), salt)
    narrow = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        order_c.alias("__ord"),
    )
    ord_key = F.desc("__ord") if descending else F.asc("__ord")
    w = Window.partitionBy("__g").orderBy(ord_key, F.asc("__id"))
    survivors = (
        narrow.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("__id")
    )
    return df.join(survivors, df[id_col] == survivors["__id"], "left_semi")


def token_budget_filter(
    df: DataFrame,
    budget: int,
    cost_col: str | Column,
    id_col: str,
    group_col: str | None = None,
    order: Column | None = None,
    descending: bool = False,
    cum_out: str | None = None,
) -> DataFrame:
    """Greedy selection under a token budget — the data-mixing quota
    every pretraining recipe applies when a source may contribute at most
    N tokens to the run: rank the group's rows by ``order`` (ascending;
    put the best first), walk the ranking, and keep each row while the
    cumulative ``cost_col`` INCLUDING that row stays ≤ ``budget``.

    Selection is a prefix of the ranking, so a single over-budget row in
    the middle ends its group's intake even if a later smaller row would
    still fit — the deterministic "greedy prefix" contract (same as
    sampling a stream until the quota trips), NOT a knapsack solve.
    A first-ranked row whose own cost exceeds ``budget`` means that group
    contributes nothing.

    With no ``order`` the ranking is the deterministic epoch-salted hash
    draw (layout-independent, SQL-re-derivable), i.e. "a uniform random
    ~budget-token sample per source"; pass ``order=F.col("quality"),
    descending=True`` to make it a quality-greedy quota (``order`` must
    be a PROJECTABLE value expression — it rides the narrow frame — so a
    ``F.desc(...)`` SortOrder is rejected with a pointer here; direction
    lives in the ``descending`` flag, the id tiebreak stays ascending).
    ``group_col=None`` applies one global budget. ``cum_out=`` keeps the
    running total as a column (the row's own cost included).

    Scale shape: the running sum is a window over a PROJECTED
    (group, id, order, cost) frame — no payload column rides the skewed
    group exchange or the per-group sort — and survivors rejoin the full
    frame via a semi-join on the uniform ``id_col`` key (unique and
    NON-NULL required, as in :func:`cap_per_group`). The per-group window
    sort is bounded by group size; a group too large to sort narrow rows
    for is already past any sane token budget — cap first, then budget.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    _reject_sortorder(order)
    cost_c = F.col(cost_col) if isinstance(cost_col, str) else cost_col
    order_c = order if order is not None else hash_bucket(F.col(id_col), "budget-v1")
    group_c = F.col(group_col) if group_col is not None else F.lit(0)
    narrow = df.select(
        group_c.alias("__g"),
        F.col(id_col).alias("__id"),
        order_c.alias("__ord"),
        cost_c.cast("long").alias("__cost"),
    )
    ord_key = F.desc("__ord") if descending else F.asc("__ord")
    w = (
        Window.partitionBy("__g")
        .orderBy(ord_key, F.asc("__id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors = (
        narrow.withColumn("__cum", F.sum("__cost").over(w))
        .filter(F.col("__cum") <= budget)
        .select("__id", "__cum")
    )
    out = df.join(survivors, df[id_col] == survivors["__id"], "inner").drop("__id")
    if cum_out is not None:
        out = out.withColumnRenamed("__cum", cum_out)
    else:
        out = out.drop("__cum")
    return out


def quantile_buckets(
    df: DataFrame,
    score: str | Column,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    stratum_col: str | None = None,
    bucket_col: str = "bucket",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Label every row with its score's quantile band — the CCNet-style
    perplexity bucketing (Wenzek et al. 2020 arXiv:1911.00359 §4.3:
    corpus split into head/middle/tail thirds by LM score per language,
    so training can mix bands at chosen rates instead of hard-dropping
    the tail).

    ``fractions`` are the ascending interior cut points (len(labels) ==
    len(fractions) + 1); a row lands in band ``i`` when its score is
    ≥ the ``fractions[i-1]`` threshold and < the next one, so the LAST
    label takes the highest scores (with the defaults: head = top
    third). ``stratum_col`` computes thresholds per stratum (CCNet does
    per-language); ``None`` = one global set.

    Scale shape — identical to :func:`percentile_filter`, generalized to
    k cut points: ALL thresholds come from ONE partial-combined
    percentile aggregate (array-probability form — one pass however many
    bands), broadcast back, and the label is a chain of JVM comparisons.
    Never a window, never a sort, never NTILE — a rank-based tercile
    would serialize each stratum through one task, which at 100 TB with
    a handful of languages is the canonical skew trap. ``approx=True``
    swaps in ``percentile_approx`` (bounded sketch state) for
    continuous-score corpora, trading exact band edges for O(accuracy)
    state, same as :func:`percentile_filter`.

    Cross-engine exactness (why the driver entry can be fully oracled):
    with INTEGER scores, both engines interpolate thresholds between
    integers; a threshold is non-integer unless it IS a data point, and
    in either case ``score >= threshold`` agrees across engines even if
    the interpolated doubles differ in the last ulp — the established
    integer-score percentile-oracle trick."""
    if len(labels) != len(fractions) + 1:
        raise ValueError(
            f"need len(labels) == len(fractions) + 1, got {len(labels)} labels "
            f"for {len(fractions)} fractions"
        )
    if list(fractions) != sorted(set(fractions)) or not all(
        0.0 < f < 1.0 for f in fractions
    ):
        raise ValueError(
            f"fractions must be strictly increasing within (0, 1), got {fractions}"
        )
    score_c = F.col(score) if isinstance(score, str) else score
    fr = F.array(*[F.lit(float(f)) for f in fractions])

    def _pct(col: str) -> Column:
        if approx:
            return F.percentile_approx(col, fr, accuracy)
        return F.percentile(col, fr)

    df = df.withColumn("__score", score_c)
    out = _with_thresholds(df, _pct, stratum_col, "__thrs")
    label = F.lit(labels[0])
    for i in range(len(fractions)):
        label = F.when(
            F.col("__score") >= F.element_at("__thrs", i + 1), F.lit(labels[i + 1])
        ).otherwise(label)
    return out.withColumn(bucket_col, label).drop("__score", "__thrs")


def global_rank(
    df: DataFrame,
    order: str | Column,
    key_col: str,
    rank_col: str = "rank",
    descending: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed GLOBAL 1-based rank by (order, key) — the total-order
    rank a plain ``row_number() OVER (ORDER BY ...)`` gives, computed
    WITHOUT the single-task global sort that window spells at scale.

    Mechanics (the canonical zipWithIndex decomposition, DataFrame-only):
    range-repartition on the full sort key (partition 0 holds the first
    range of the order), per-partition ``row_number`` over the SAME key,
    then add per-partition row-count prefix offsets. The offset frame
    has one row per partition — its cumulative window and the broadcast
    join-back are O(partitions), never O(rows). Range boundaries come
    from sampling, but (order, key) is a TOTAL order (``key_col`` must
    be unique), so every boundary placement yields the identical rank
    column — determinism does not depend on the sampler.

    ``order`` must be a projectable value expression (direction goes in
    ``descending``); ties in ``order`` break by ``key_col`` ASCENDING.
    NULL order values sort LAST in both directions (they rank after
    every real value, matching the engines' DESC NULLS LAST / the
    oracle discipline). Rows ride the exchange with whatever columns
    ``df`` carries — project narrow BEFORE calling (same contract as
    ``cap_per_group``'s window frame).
    """
    _reject_sortorder(order)
    ord_c = F.col(order) if isinstance(order, str) else order
    o1 = ord_c.desc_nulls_last() if descending else ord_c.asc_nulls_last()
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    r = df.repartitionByRange(n, o1, F.col(key_col).asc()).withColumn(
        "__gr_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__gr_pid").orderBy(o1, F.col(key_col).asc())
    r = r.withColumn("__gr_local", F.row_number().over(w_local))
    counts = r.groupBy("__gr_pid").agg(F.count(F.lit(1)).alias("__gr_n"))
    # one row per partition: the cumulative window below is O(partitions)
    w_off = (
        Window.orderBy(F.col("__gr_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "__gr_off", F.coalesce(F.sum("__gr_n").over(w_off), F.lit(0))
    ).select("__gr_pid", "__gr_off")
    out = r.join(F.broadcast(offs), "__gr_pid").withColumn(
        rank_col,
        (F.col("__gr_off") + F.col("__gr_local")).cast("long"),
    )
    return out.drop("__gr_pid", "__gr_local", "__gr_off")
