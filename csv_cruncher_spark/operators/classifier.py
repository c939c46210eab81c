"""Distributed logistic-regression quality classifier — bit-reproducible.

The GPT-3 / CCNet training-data pattern: a linear classifier over cheap
hand-crafted text features scores every document, and the corpus is
filtered (or importance-weighted) by the predicted probability. The
reference engine has no trainable operator at all (its surface stops at
SQL aggregation, HsqldbFacade.kt:1); this module shows the pattern a
Spark-native training-data engine needs — full-corpus iterative
optimization where EVERY pass is a single map-side-combinable
aggregation — while keeping the repo's cross-engine-exactness bar.

Why it scales (the 100 TB story):
- The feature projection is computed once and persisted: k int64 columns
  per document, no text. At 10^10 docs that is ~0.3 TB — a scan, never
  a shuffle.
- One training iteration = ONE ``df.agg`` of k+2 integer sums: partial
  aggregation happens map-side on every partition, the final combine
  moves k+2 longs per partition to one reducer. No row ever shuffles.
- Iterations are driver-sequenced, weights are O(k) scalars embedded as
  literals in the next pass (the classic distributed-GD layout;
  identical to what spark.ml's LogisticRegression aggregates, minus the
  JVM vector types).

Why it is bit-reproducible (and therefore DuckDB-oracle-able end to
end, training included):
- Features are integer-micro quantized: X = round(ratio * 1e6) as
  int64, the same trick the tfidf/Zipf operators use. The ratios are
  quotients of small exact integers, so the doubles being rounded are
  bit-identical in any IEEE engine.
- Per-row sigmoid output is quantized to micro units BEFORE summation:
  q = round(1e6 * sigmoid(z)) as int64. Gradient components are then
  sums of int64 products — exact and ORDER-INDEPENDENT, so any
  partitioning/layout of the corpus produces the same gradient, and
  Spark and DuckDB agree bit-for-bit. (Float sums are the classic
  nondeterminism source in distributed GD; integer sums close it.)
- The z / sigmoid expression is built from ONE shared SQL string
  (``z_sql`` / ``sigmoid_micro_sql``) used verbatim by both the Spark
  side (``F.expr``) and the generated DuckDB oracle — same parse tree,
  same left-associated double arithmetic, same literals (``repr`` of
  the Python float round-trips exactly).
- The only cross-engine wobble left is the last ulp of ``exp``; it can
  flip q only when sigmoid(z) lands within ~1e-16 of a 0.5e-6 rounding
  boundary (~1e-10 per row-iteration — negligible, and the oracle gate
  would catch a flip as a 1-micro diff).

Exactness bound (documented like the Zipf int64 bound): a row
contributes at most 1e6 * max_micro_feature to a gradient sum; with
ratio-features (max_micro ~= 1e7) the int64 sum is exact up to
~9e18 / 1e13 ~= 9e5 ... 1e6 rows per partition-tree. Past that, train on
a deterministic sample or switch the sums to DOUBLE (order-dependent,
reproducible only per-layout) — the API takes the feature frame, so the
caller chooses.

Reference provenance: the reference has no counterpart; this is the
training-data-pipeline extension mandated by the build brief (quality
scoring / classifier filtering a la GPT-3 appendix A, CCNet Sec 4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000  # fixed-point scale for features and probabilities

# default hand-crafted quality features over the documents schema;
# each is round((small-int ratio) * 1e6) — see micro_feature_frame
DEFAULT_FEATURES = ("x_stop", "x_toklen", "x_alpha")

# Fixed affine standardization (center, multiplier) applied to the raw
# micro ratios so every feature spans roughly ±1 unit after /1e6 —
# batch GD needs comparably-scaled features to converge in tens of
# iterations. The constants are DATA-INDEPENDENT web-text priors
# (stopword ratio 0.06, mean token length 4.5 chars, alpha ratio 0.82),
# not corpus statistics: streaming/incremental batches standardize
# identically without a stats pass, and the transform is exact int64
# arithmetic both engines replay bit-for-bit (no division).
STANDARDIZE = {
    "x_stop": (60_000, 16),
    "x_toklen": (4_500_000, 1),
    "x_alpha": (820_000, 40),
}


def micro_feature_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Project documents to standardized integer-micro quality features.

    Returns (id_col, *keep_cols, x_stop, x_toklen, x_alpha) with each
    feature as int64 micro units of (raw_ratio_micro - center) * mult
    per ``STANDARDIZE``; the underlying raw ratios are

    - x_stop   : round(1e6 * stopword_tokens / tokens)
    - x_toklen : round(1e6 * mean_token_length)   (chars-(t-1))/t
    - x_alpha  : round(1e6 * alpha_chars / chars)

    Documents with NULL or empty text are dropped (every ratio is
    undefined on them); the oracle applies the identical filter. All
    JVM-side codegen'd expressions — this is the only pass that touches
    text, and it prunes to the projected columns immediately.
    """
    from .textstats import STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    t = f"size(split({text_col}, ' '))"
    s = f"size(filter(split({text_col}, ' '), x -> x IN ({stop_list})))"
    chars = f"length({text_col})"
    alpha = f"length(regexp_replace({text_col}, '[^a-zA-Z]', ''))"
    raw = {
        "x_stop": f"({s} / {t})",
        "x_toklen": f"(({chars} - ({t} - 1)) / {t})",
        "x_alpha": f"({alpha} / {chars})",
    }
    return df.where(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(
        id_col,
        *keep_cols,
        *(
            F.expr(
                f"(CAST(round({raw[c]} * 1000000.0) AS BIGINT) - {ctr}) * {mul}"
            ).alias(c)
            for c, (ctr, mul) in STANDARDIZE.items()
        ),
    )


def micro_feature_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of micro_feature_frame (same doubles, same rounding,
    same standardization constants)."""
    from .textstats import STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    t = f"len(string_split({text_col}, ' '))"
    s = f"len(list_filter(string_split({text_col}, ' '), x -> x IN ({stop_list})))"
    chars = f"length({text_col})"
    alpha = f"length(regexp_replace({text_col}, '[^a-zA-Z]', '', 'g'))"
    raw = {
        "x_stop": f"({s} / {t})",
        "x_toklen": f"(({chars} - ({t} - 1)) / {t})",
        "x_alpha": f"({alpha} / {chars})",
    }
    feats = ",\n               ".join(
        f"(CAST(round({raw[c]} * 1000000.0) AS BIGINT) - {ctr}) * {mul} AS {c}"
        for c, (ctr, mul) in STANDARDIZE.items()
    )
    keep = "".join(f"{c}, " for c in keep_cols)
    return f"""
        SELECT {id_col}, {keep}
               {feats}
        FROM {table}
        WHERE {text_col} IS NOT NULL AND length({text_col}) > 0
    """


def z_sql(weights: list[float], feature_cols: tuple[str, ...]) -> str:
    """The linear score  w0 + sum_j w_j * (X_j / 1e6)  as a SQL string.

    ONE string used by both engines: literals via repr() (shortest
    round-trip decimal — parses back to the identical double), strictly
    left-associated additions, per-feature ``(col / 1000000.0)``
    de-quantization. Any IEEE engine evaluates it bit-identically.
    """
    terms = [repr(weights[0])] + [
        f"{weights[j + 1]!r} * ({c} / 1000000.0)" for j, c in enumerate(feature_cols)
    ]
    return " + ".join(terms)


def sigmoid_micro_sql(weights: list[float], feature_cols: tuple[str, ...]) -> str:
    """round(1e6 * sigmoid(z)) as BIGINT — the quantized probability."""
    z = z_sql(weights, feature_cols)
    return f"CAST(round((1.0 / (1.0 + exp(-({z})))) * 1000000.0) AS BIGINT)"


def train_logreg(
    feats: DataFrame,
    label_col: str,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    iters: int = 8,
    lr: float = 0.5,
) -> list[float]:
    """Batch gradient descent; returns [w0, w1..wk] (bias first).

    Each iteration is ONE narrow aggregation job over ``feats``
    (persist it if training many iterations — the projection is k int64
    columns per row). The gradient of the logloss is
        g_j = sum_i (p_i - y_i) * x_ij
    computed entirely in int64 micro units:
        G_0 = sum(q - 1e6*y)            -> g_0 = G_0 / 1e6
        G_j = sum((q - 1e6*y) * X_j)    -> g_j = G_j / 1e12
    and the update  w -= lr * G / (n * scale)  is plain Python float
    arithmetic on exact integers — spelled identically in the DuckDB
    oracle (oracle_training_sql), so the learned weights match
    bit-for-bit across engines.
    """
    w = [0.0] * (len(feature_cols) + 1)
    # Round-6: the iterations are driver-sequenced jobs whose latency is
    # TASK COUNT, not data — a tiny cached feature frame spread over the
    # session's default partitions paid ~32 tasks × 2 stages per
    # iteration for a few thousand rows. Right-size the per-iteration
    # scan from the frame's ACTUAL row count (one count job, amortized
    # over ``iters``; it also materializes a caller-persisted frame at
    # full parallelism before the narrow coalesce): ~2M rows per task —
    # at bench scale that is 1 task per iteration, at 10^10 rows it is
    # thousands, and integer partial sums are identical under any
    # partitioning.
    n_rows = feats.count()
    scan = feats.coalesce(max(1, min(n_rows // 2_000_000 + 1, 10_000)))
    for _ in range(iters):
        q = F.expr(sigmoid_micro_sql(w, feature_cols))
        r = q - F.lit(MICRO) * F.col(label_col).cast("long")
        aggs = [F.sum(r).alias("g0"), F.count(F.lit(1)).alias("n")] + [
            F.sum(r * F.col(c)).alias(f"g{j + 1}") for j, c in enumerate(feature_cols)
        ]
        row = scan.agg(*aggs).collect()[0]
        n = row["n"]
        w = [w[0] - lr * (row["g0"] / (n * 1000000.0))] + [
            w[j + 1] - lr * (row[f"g{j + 1}"] / (n * 1000000000000.0))
            for j in range(len(feature_cols))
        ]
    return w


def cte_sigmoid_micro_sql(feature_cols: tuple[str, ...] = DEFAULT_FEATURES) -> str:
    """The quantized-probability string with w0..wk as COLUMN references
    (for scoring against a trained-weights CTE/row) — term-for-term the
    arithmetic of ``sigmoid_micro_sql``, so a weight row whose doubles
    match the Python list scores every document identically."""
    z = " + ".join(
        ["w0"] + [f"w{j + 1} * ({c} / 1000000.0)" for j, c in enumerate(feature_cols)]
    )
    return f"CAST(round((1.0 / (1.0 + exp(-({z})))) * 1000000.0) AS BIGINT)"


def oracle_training_sql(
    feature_source_sql: str,
    label_expr: str,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    iters: int = 8,
    lr: float = 0.5,
    keep_cols: tuple[str, ...] = (),
) -> str:
    """Generate the chained-CTE DuckDB twin of train_logreg.

    ``feature_source_sql`` must yield the feature columns;
    ``label_expr`` an int 0/1 over its columns. Produces CTEs
    ``it0..it{iters}`` each holding the weight row after that many
    iterations; the caller composes the final SELECT (``feats`` carries
    ``keep_cols`` through untouched for that purpose). The per-iteration
    arithmetic strings are generated from the SAME helpers the Spark
    side executes.

    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    it_t -> grad_{t-1} -> (feats, it_{t-1}) reference chain would expand
    to a 2^iters-node tree (at 20 iterations that is a million re-scans
    of the corpus — found the hard way as an fd-exhaustion crash).
    Materialization makes the oracle linear in iters, mirroring the
    Spark side's one-job-per-iteration shape.
    """
    k = len(feature_cols)
    keep = "".join(f"{c}, " for c in keep_cols)
    parts = [
        f"feats AS MATERIALIZED (SELECT {keep}({label_expr}) AS y, "
        f"{', '.join(feature_cols)} FROM ({feature_source_sql}))",
        "it0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1))
        + ")",
    ]
    for t in range(iters):
        # q from the PREVIOUS weights: the shared sigmoid string with the
        # weight literals replaced by the CTE's columns
        q = cte_sigmoid_micro_sql(feature_cols)
        g_terms = ", ".join(
            ["SUM(q - 1000000 * y) AS g0", "COUNT(*) AS n"]
            + [f"SUM((q - 1000000 * y) * {c}) AS g{j + 1}" for j, c in enumerate(feature_cols)]
        )
        parts.append(
            f"grad{t} AS MATERIALIZED (SELECT {g_terms} FROM "
            f"(SELECT y, {', '.join(feature_cols)}, {q} AS q FROM feats CROSS JOIN it{t}))"
        )
        upd = ", ".join(
            [f"w0 - {lr!r} * (g0 / (n * 1000000.0)) AS w0"]
            + [
                f"w{j + 1} - {lr!r} * (g{j + 1} / (n * 1000000000000.0)) AS w{j + 1}"
                for j in range(k)
            ]
        )
        parts.append(
            f"it{t + 1} AS MATERIALIZED (SELECT {upd} FROM it{t} CROSS JOIN grad{t})"
        )
    return "WITH " + ",\n".join(parts)


def score_micro(weights: list[float], feature_cols: tuple[str, ...] = DEFAULT_FEATURES):
    """Column: quantized predicted probability under trained weights."""
    return F.expr(sigmoid_micro_sql(list(weights), feature_cols))


def _ratio_micro(num, den):
    """round(1e6 * num/den) as int64, NULL when den = 0 — ONE IEEE
    division of two exact int64 sums then one rounding, so both engines
    agree bit-for-bit (the module's established quantization shape)."""
    return F.when(
        den != 0,
        F.round(F.lit(1_000_000.0) * num / den).cast("bigint"),
    )


def evaluate(
    scored: DataFrame,
    label_col: str = "y",
    pred_col: str = "pred",
) -> DataFrame:
    """Classifier evaluation — ONE row of exact confusion counts and
    micro-quantized metrics: (n, tp, fp, fn, tn, accuracy_micro,
    precision_micro, recall_micro, f1_micro).

    The counts are int64 sums of 0/1 indicators (order-independent,
    exact); each metric is a single rounded division of two of those
    sums — f1 uses the harmonic identity ``2·tp / (2·tp + fp + fn)``
    directly so no rounded intermediate ever feeds another division.
    Degenerate denominators (no positive predictions / no positive
    labels / empty frame) yield NULL, never a fake 0. Scale shape: one
    partial-combined aggregation, four longs per partition to one
    reducer."""
    y = F.col(label_col).cast("long")
    p = F.col(pred_col).cast("long")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y * p).alias("tp"),
        F.sum((1 - y) * p).alias("fp"),
        F.sum(y * (1 - p)).alias("fn"),
        F.sum((1 - y) * (1 - p)).alias("tn"),
    )
    tp, fp, fn, tn, n = (F.col(c) for c in ("tp", "fp", "fn", "tn", "n"))
    return agg.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        _ratio_micro(tp + tn, n).alias("accuracy_micro"),
        _ratio_micro(tp, tp + fp).alias("precision_micro"),
        _ratio_micro(tp, tp + fn).alias("recall_micro"),
        _ratio_micro(2 * tp, 2 * tp + fp + fn).alias("f1_micro"),
    )


def calibration_bins(
    scored: DataFrame,
    p_col: str = "p_micro",
    label_col: str = "y",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram as data: bucket the quantized probability
    into ``n_bins`` equal-width bins and report per bin (bin, n,
    mean_p_micro, pos_rate_micro, gap_micro) — a well-calibrated
    classifier has gap ≈ 0 everywhere; Σ n·|gap|/Σn is the expected
    calibration error. Binning is pure integer arithmetic
    (``p·n_bins div 1e6``, top edge folded into the last bin), the two
    per-bin ratios are single rounded divisions of exact int64 sums,
    and ``gap_micro`` is their exact integer difference — fully
    cross-engine-exact. One hash aggregation over ≤ ``n_bins`` groups;
    empty bins are absent (nothing was observed there)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    p = F.col(p_col).cast("long")
    y = F.col(label_col).cast("long")
    # integer floor-division binning: `div` in Spark, `//` in DuckDB —
    # exact int64 semantics on both, never a double->int cast (whose
    # rounding convention differs across engines)
    b = F.least(
        F.expr(f"CAST({p_col} AS BIGINT) * {n_bins} div {MICRO}"),
        F.lit(n_bins - 1).cast("bigint"),
    )
    agg = (
        scored.select(b.alias("bin"), p.alias("__p"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__p").alias("__sp"),
            F.sum("__y").alias("__sy"),
        )
    )
    mean_p = F.round(F.col("__sp") / F.col("n")).cast("bigint")
    pos = _ratio_micro(F.col("__sy"), F.col("n"))
    return agg.select(
        "bin",
        "n",
        mean_p.alias("mean_p_micro"),
        pos.alias("pos_rate_micro"),
        (mean_p - pos).alias("gap_micro"),
    )
