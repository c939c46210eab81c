"""Count-min sketch as a DataFrame aggregation: bounded-memory token
frequency estimation for unbounded web vocabularies.

At 100 TB the exact token-frequency table (``textstats.token_frequencies``)
is itself huge — 10^9+ distinct tokens — and many consumers (admission
heuristics, stop-token detection, quota gates) only need approximate
counts with a one-sided error bound. A count-min sketch (Cormode &
Muthukrishnan 2005) holds ``depth × width`` int64 counters regardless of
vocabulary size: estimate(t) = min over the ``depth`` rows of the
counter each row hashes t into; the estimate NEVER undercounts and
overcounts by ≤ (total_tokens / width) with probability ≥ 1 − 2^-depth.

Spark-first shape: the sketch IS a DataFrame of (row, bucket, c) — built
by ONE partial-combined aggregation over (row, bucket) keys (depth·width
distinct keys, so the map side collapses everything; the shuffle carries
at most depth·width rows per task). No driver state, no UDAF, no RDDs;
merging sketches of two corpora is a union + re-aggregate, and the
sketch parquet-persists like any table (the ``bloom_bits`` discipline,
operators/bloom.py).

Cross-engine exactness: bucket assignment is the portable
48-bit-md5-prefix-mod trick (``minhash_md5_signatures``,
operators/dedup.py:291) and every counter is an int64 SUM — the DuckDB
oracle replays the build AND the probe bit-for-bit, so this
"approximate" operator still carries a FULL value oracle (the estimates
are deterministic; only their relation to exact counts is approximate,
and the overestimate bound is pinned by tests).

The reference engine has no sketch operators; this is part of the
beyond-reference training-data layer (brief: "a novel sketch").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def count_min_build(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch over the whitespace token stream of ``text_col``.

    Returns (row, bucket, c): one int64 counter per non-empty cell
    (absent cells are zero — the probe coalesces).

    Plan (round-6 restructure — guide §1.2 per-task work): aggregate the
    token stream to (token, n) FIRST (one partial-combined hash
    aggregation on the vocabulary key), then hash each DISTINCT token
    ``depth`` times and SUM the occurrence counts into (row, bucket).
    The ``depth`` md5 evaluations per token — the dominant cost — now
    run once per vocabulary entry instead of once per occurrence
    (~100× fewer at web token frequencies); the cell counters are
    identical because a cell's counter is the sum of the occurrence
    counts of the tokens hashing into it. Both aggregations partial-
    combine map-side (vocab keys, then depth·width keys), so the 100-TB
    shape is unchanged."""
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    if df.isStreaming:
        # structured streaming cannot chain two aggregations — a LIVE
        # sketch keeps the legacy one-aggregation plan (hash per
        # occurrence); identical counters either way
        rows = toks.select(
            "tok",
            F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
        )
        return (
            rows.select("row", _bucket_for_rows("tok", width))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__n"))
    rows = counts.select(
        "tok",
        "__n",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    return (
        rows.select("row", _bucket_for_rows("tok", width), "__n")
        .groupBy("row", "bucket")
        .agg(F.sum("__n").alias("c"))
    )


def _bucket_for_rows(tok_col: str, width: int) -> F.Column:
    """Portable bucket hash keyed by the ALREADY-EXPLODED row column:
    uint48 of md5(tok || ':cms:' || row) mod width — bit-identical to
    DuckDB's ('0x' || substr(md5(...), 1, 12))::BIGINT % width. Each
    sketch row value acts as an independent hash function."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(tok_col), F.lit("cms"), F.col("row").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    ).alias("bucket")


def hll_build(
    df: DataFrame,
    item_col: str,
    m: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog registers over ``item_col`` (Flajolet et al. 2007):
    bounded-memory distinct counting for unbounded web key spaces
    (distinct URLs per host, distinct tokens per source) — the
    cardinality companion to the count-min frequency sketch above.

    Each item hashes once; the first 48 bits of md5(item || ':hll')
    pick one of ``m`` registers, the next 48 bits supply rho = number
    of leading zero bits + 1 (49 when all 48 are zero). The sketch IS a
    DataFrame of (group..., bucket, r) with r = MAX(rho) — ONE hash
    aggregation whose key space is |groups|·m, so the map-side combine
    collapses any input size to at most m partial rows per group per
    task. Merging sketches of two corpora is a union + re-aggregate
    (``hll_merge``); estimation (``hll_estimate``) is one more
    aggregation over ≤ m rows per group. No driver state, no UDAF.

    Cross-engine exactness: bucket and rho are pure string/arithmetic
    ops on the md5 hex (leading-zero count via a ^0* regexp over the
    hex chars plus a CASE on the first non-zero nibble), so DuckDB
    replays the registers bit-for-bit; only the final estimate touches
    doubles, and its formula text is mirrored verbatim in the oracle
    (the ``pmi_collocations`` discipline)."""
    _check_m(m)
    gcols = list(group_cols)
    bucket, rho = hll_bucket_rho(F.col(item_col), m)
    return (
        # NULL items count as no item (countDistinct semantics); without
        # the filter F.concat would propagate a NULL-bucket register
        # that corrupts present/zeros in the estimate.
        # Round-6: DISTINCT (group, item) first — (bucket, rho) is a pure
        # function of the item, so duplicate occurrences contribute
        # nothing to MAX(rho), and the md5 now runs once per distinct
        # item instead of once per occurrence (guide §1.2). The distinct
        # partial-combines map-side like the register agg did; registers
        # are bit-identical. Streaming inputs keep the legacy
        # one-aggregation plan (a distinct before an agg is two chained
        # aggregations, unsupported in structured streaming).
        _maybe_distinct(df.where(F.col(item_col).isNotNull()), gcols, item_col)
        .select(*gcols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def _maybe_distinct(df: DataFrame, gcols: list, item_col: str) -> DataFrame:
    if df.isStreaming:
        return df
    return df.select(*gcols, item_col).distinct()


def _check_m(m: int) -> None:
    """Register counts are bounded so the estimate's int64 harmonic sum
    cannot overflow: z_scaled ≤ m·2^49, which needs m ≤ 2^13 to stay
    under 2^63. Standard error is 1.04/sqrt(m), so 8192 registers
    already give ~1.1% — beyond that, raise the exactness trade
    explicitly rather than wrap silently."""
    if not 1 <= m <= 8192:
        raise ValueError(f"m must be in [1, 8192] (int64-exact estimate), got {m}")


def hll_bucket_rho(item: F.Column, m: int) -> tuple[F.Column, F.Column]:
    """The (register index, rho) column pair for one item — the pure
    expressions ``hll_build`` aggregates, exposed so maintained views
    (lake/sketch_view.py) can derive them on change-feed images. Both
    are int expressions over the md5 hex; rho ∈ [1, 49]."""
    h = F.md5(F.concat(item.cast("string"), F.lit(":hll")))
    bucket = F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(m))
    tail = F.substring(h, 13, 12)
    zhex = F.length(F.regexp_extract(tail, "^0*", 0))
    first_nonzero = tail.substr(zhex + F.lit(1), F.lit(1))
    extra = (
        F.when(first_nonzero == "1", 3)
        .when(first_nonzero.isin("2", "3"), 2)
        .when(first_nonzero.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (
        F.when(zhex == 12, F.lit(49)).otherwise(zhex * 4 + extra + 1)
    ).cast("int")
    return bucket, rho


def hll_merge(a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union two register sets built with the same m: register-wise MAX.
    Associative and idempotent — corpora can be sketched independently
    (per partition, per day, per crawl) and folded in any order.
    Group columns are taken from the sketch schema itself (everything
    except ``r``), so merging grouped sketches can never silently
    collapse groups; passing ``group_cols`` explicitly just validates
    they are present."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"register schemas differ: {sorted(a.columns)} vs {sorted(b.columns)}"
        )
    missing = [g for g in group_cols if g not in a.columns]
    if missing:
        raise ValueError(f"group columns absent from the sketch: {missing}")
    keys = [c for c in a.columns if c != "r"]
    return a.unionByName(b).groupBy(*keys).agg(F.max("r").alias("r"))


def hll_estimate(
    sketch: DataFrame,
    m: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct-count estimate from the registers: the classic
    bias-corrected harmonic mean with the small-range (linear counting)
    correction. Returns (group..., present, zeros, z_scaled,
    est_distinct) — present/zeros/z_scaled are EXACT int64s (z_scaled =
    sum over all m registers of 2^(49-r), absent registers contributing
    2^49, kept integer so both engines agree bit-for-bit); only
    est_distinct touches doubles, with the formula text mirrored
    verbatim in the DuckDB oracle. Standard error ≈ 1.04/sqrt(m) ≈ 3.3%%
    at m=1024. ONE aggregation over ≤ m rows per group."""
    _check_m(m)
    gcols = list(group_cols)
    two49 = 1 << 49
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("present"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("zeros"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - r)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(two49)
        ).cast("long").alias("z_scaled"),
    )
    alpha_expr = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    raw = f"{alpha_expr} * {m}.0 * {m}.0 * {float(two49):.1f} / CAST(z_scaled AS DOUBLE)"
    est = (
        f"CAST(ROUND(CASE WHEN zeros > 0 AND {raw} <= {2.5 * m} "
        f"THEN {m}.0 * LN({m}.0 / CAST(zeros AS DOUBLE)) "
        f"ELSE {raw} END, 0) AS BIGINT)"
    )
    return agg.select(
        *gcols, "present", "zeros", "z_scaled", F.expr(est).alias("est_distinct")
    )


def hll_oracle_sql(
    source_expr: str,
    item_expr: str,
    m: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB fragment replaying build + estimate bit-for-bit over a
    relation ``{source_expr}`` exposing ``{item_expr}`` (and the group
    columns). Register arithmetic is exact; the estimate doubles mirror
    ``hll_estimate``'s expression text verbatim."""
    _check_m(m)
    g = ", ".join(group_cols)
    gsel = (g + ", ") if g else ""
    gby = ("GROUP BY " + g) if g else ""
    two49 = 1 << 49
    h = f"md5({item_expr} || ':hll')"
    tail = f"substr({h}, 13, 12)"
    zhex = f"length(regexp_extract({tail}, '^0*'))"
    raw = (
        f"(0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 * {float(two49):.1f}"
        " / CAST(z_scaled AS DOUBLE)"
    )
    return f"""
        WITH hll_cells AS (
          SELECT {gsel}
                 (('0x' || substr({h}, 1, 12))::BIGINT % {m}) AS bucket,
                 max(CASE WHEN {zhex} = 12 THEN 49
                     ELSE {zhex} * 4
                          + (CASE substr({tail}, {zhex} + 1, 1)
                             WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                             WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                             WHEN '7' THEN 1 ELSE 0 END)
                          + 1 END) AS r
          FROM {source_expr}
          WHERE {item_expr} IS NOT NULL
          GROUP BY {", ".join(list(group_cols) + ["bucket"])}
        ),
        hll_agg AS (
          SELECT {gsel}
                 count(*)::BIGINT AS present,
                 ({m} - count(*))::BIGINT AS zeros,
                 (sum((1::BIGINT << (49 - r))) + ({m} - count(*)) * {two49})::BIGINT
                   AS z_scaled
          FROM hll_cells {gby}
        )
        SELECT {gsel}present, zeros, z_scaled,
               CAST(ROUND(CASE WHEN zeros > 0 AND {raw} <= {2.5 * m}
                    THEN {m}.0 * LN({m}.0 / CAST(zeros AS DOUBLE))
                    ELSE {raw} END, 0) AS BIGINT) AS est_distinct
        FROM hll_agg
    """


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate counts for ``probes[token_col]`` against a built sketch:
    est(t) = min over rows of the counter t hashes into, 0 when any row's
    cell is empty (an absent cell means nothing ever hashed there, and
    min(…, 0) = 0 — tokens never seen estimate exactly 0 unless every
    one of their ``depth`` cells collides).

    Plan: probes replicate ``depth`` ways (narrow), LEFT equi-join on the
    (row, bucket) key — the sketch side is at most depth·width rows, so
    Spark broadcasts it — then ONE MIN aggregation per token. O(probes)
    end-to-end."""
    p = probes.select(F.col(token_col).alias("tok")).select(
        "tok",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    keyed = p.select("tok", "row", _bucket_for_rows("tok", width))
    joined = keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy("tok").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count")
    )
