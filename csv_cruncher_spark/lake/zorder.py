"""Z-order (Morton curve) clustering for multi-dimensional scan pruning.

The lake's bucket files sort by the primary key (``table.py
write_bucket_data``), which makes KEYED reads skip row groups — but an
analytical scan filtering on two OTHER dimensions (host hash × crawl
time, lang × quality band) gets no locality from a key sort: a box
predicate touches every file. Interleaving the bits of the filter
dimensions into one Morton code and laying data out in that order gives
every file a tight bounding box in ALL interleaved dimensions at once,
so min/max pruning (parquet row-group stats, or the manifest-level
min/max this module's report computes) skips most of the table for a
box query — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout, built here
from pure Catalyst bit arithmetic.

Everything is integer shifts/masks on int64 — no UDFs, and the DuckDB
oracle replays the exact interleave formula (``z_value_sql`` emits it
in DuckDB's operator dialect from the same generator loop, the pmi
discipline), so the layout comparison is bit-exact cross-engine.

Scale shape: ``z_value`` is a projection (free at any scale);
``zorder_layout`` is ONE range shuffle on the z-code (the same cost as
the key sort it replaces); the pruning report is one partial-combined
aggregation per layout over (bucket → min/max/count). Nothing here
collects more than O(buckets) rows.

Reference parity: csv-cruncher's manual ``Indexes.md`` story is
single-column HSQLDB indexes; multi-dimensional clustering is
new-engine surface for the 100-TB lake layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hard cap keeping every interleave result in int64 with headroom
MAX_TOTAL_BITS = 62


def _check(cols: list[str], bits: int) -> None:
    if not cols or len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits < 1 or bits * len(cols) > MAX_TOTAL_BITS:
        raise ValueError(
            f"bits*len(cols) must be in [len(cols), {MAX_TOTAL_BITS}], "
            f"got bits={bits} cols={len(cols)}"
        )


def z_value(cols: list, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each dimension —
    column names or Column expressions (callers normalize dimensions to
    [0, 2^bits) first — e.g. ``F.abs(F.hash(host)) % (1 << bits)``, or
    epoch-seconds right-shifted to the wanted granularity). Bit b of
    dimension i lands at position ``b*len(cols) + i``. NULL in any
    dimension → NULL z (callers route NULLs to a dedicated bucket or
    filter them first)."""
    _check(cols, bits)
    n = len(cols)
    dims = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(dims):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def z_value_sql(cols: list[str], bits: int = 16) -> str:
    """The SAME interleave, rendered as DuckDB SQL (operators ``>> <<
    & |`` instead of Spark's shiftleft/shiftright functions) from the
    same loop — the cross-engine oracle replays the formula verbatim."""
    _check(cols, bits)
    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(
                f"((({c}::BIGINT >> {b}) & 1) << {b * n + i})"
            )
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, n_files: int | None = None
) -> DataFrame:
    """Lay the frame out in Morton order: ONE range shuffle on the
    z-code plus a within-partition sort, so each output file covers a
    compact z-range — i.e. a tight bounding box in every interleaved
    dimension. Write the result with any sink; parquet row-group
    min/max stats on the dimension columns then do the pruning."""
    z = z_value(cols, bits).alias("__z")
    out = df.select("*", z)
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files
        else out.repartitionByRange("__z")
    )
    return out.sortWithinPartitions("__z").drop("__z")


def pruning_report(
    df: DataFrame,
    cols: list[str],
    box: dict[str, tuple[int, int]],
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Quantified pruning comparison: bucket the frame two ways —
    Morton order vs lexicographic (cols[0] major) — into 2^bucket_bits
    deterministic buckets, compute each bucket's per-dimension min/max
    envelope, and report how many buckets (and rows) a box predicate
    ``{col: (lo, hi)}`` would have to read under each layout.

    Buckets are ``code >> (bits*n - bucket_bits)`` — a pure function of
    the row, NOT a data-dependent range split, so the oracle reproduces
    them exactly. One aggregation per layout; output one row per layout:
    (layout, n_buckets, buckets_touched, rows_touched, rows_total).
    """
    _check(cols, bits)
    n = len(cols)
    total_bits = bits * n
    if not (1 <= bucket_bits <= total_bits):
        raise ValueError(f"bucket_bits must be in [1, {total_bits}]")
    for c in box:
        if c not in cols:
            raise ValueError(f"box dimension {c!r} not in z-order columns")
    shift = total_bits - bucket_bits

    lex = F.lit(0).cast("long")
    for c in cols:  # cols[0] = most significant (the "sort by a, b" layout)
        lex = F.shiftleft(lex, bits).bitwiseOR(
            F.col(c).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        )
    codes = {"zorder": z_value(cols, bits), "lex": lex}

    reports = []
    for layout, code in codes.items():
        buckets = df.groupBy(
            F.shiftright(code, shift).alias("__bucket")
        ).agg(
            F.count(F.lit(1)).alias("__rows"),
            *[m for c in cols for m in (
                F.min(F.col(c)).alias(f"__min_{c}"),
                F.max(F.col(c)).alias(f"__max_{c}"),
            )],
        )
        touched = F.lit(True)
        for c, (lo, hi) in box.items():
            touched = touched & (
                (F.col(f"__max_{c}") >= F.lit(int(lo)))
                & (F.col(f"__min_{c}") <= F.lit(int(hi)))
            )
        reports.append(
            buckets.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum(touched.cast("long")).alias("buckets_touched"),
                F.sum(F.when(touched, F.col("__rows")).otherwise(0)).alias(
                    "rows_touched"
                ),
                F.sum("__rows").alias("rows_total"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
