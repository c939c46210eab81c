"""Trained quality classifier (operators/classifier.py): feature
projection semantics, layout-invariant (bit-reproducible) training,
learning on a separable rule, and the shared-arithmetic contract between
the Spark expressions and the generated DuckDB oracle strings."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import classifier


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_frame_values_and_null_drop(spark):
    df = _docs(
        spark,
        [
            (1, "the cat sat"),          # 1 stopword of 3 tokens
            (2, None),                    # dropped
            (3, ""),                      # dropped
        ],
    )
    out = {r["doc_id"]: r for r in classifier.micro_feature_frame(df).collect()}
    assert set(out) == {1}
    r = out[1]
    # raw ratios: stop=1/3, toklen=(11-2)/3=3, alpha=9/11
    ctr, mul = classifier.STANDARDIZE["x_stop"]
    assert r["x_stop"] == (round(1 / 3 * 1e6) - ctr) * mul
    ctr, mul = classifier.STANDARDIZE["x_toklen"]
    assert r["x_toklen"] == (3_000_000 - ctr) * mul
    ctr, mul = classifier.STANDARDIZE["x_alpha"]
    assert r["x_alpha"] == (round(9 / 11 * 1e6) - ctr) * mul


def _labeled_feats(spark):
    import os

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return classifier.micro_feature_frame(docs).withColumn(
        "y", (F.col("x_stop") >= 0).cast("int")
    )


def test_training_is_layout_invariant(spark):
    """Integer-micro gradient sums are order-independent, so any
    partitioning of the corpus must learn the IDENTICAL weights."""
    feats = _labeled_feats(spark)
    w_1 = classifier.train_logreg(feats.coalesce(1), "y", iters=5, lr=1.0)
    w_7 = classifier.train_logreg(
        feats.repartition(7, F.col("doc_id") % 7), "y", iters=5, lr=1.0
    )
    assert w_1 == w_7  # bit-for-bit, not approx


def test_training_learns_the_rule(spark):
    feats = _labeled_feats(spark).persist()
    w = classifier.train_logreg(feats, "y", iters=20, lr=1.0)
    # the label is a threshold on x_stop: its weight must dominate and
    # point the right way
    assert w[1] > 0
    assert abs(w[1]) > max(abs(w[2]), abs(w[3]))
    p = classifier.score_micro(w)
    acc = feats.select(
        F.avg((((p >= 500_000).cast("int")) == F.col("y")).cast("double")).alias("a")
    ).collect()[0]["a"]
    assert acc >= 0.9
    feats.unpersist()


def test_score_micro_matches_python_sigmoid(spark):
    w = [0.25, 1.5, -0.5, 0.125]
    df = spark.createDataFrame(
        [(1, 320000, -100000, 40000), (2, -960000, 500000, -1000000)],
        "doc_id long, x_stop long, x_toklen long, x_alpha long",
    )
    got = {r["doc_id"]: r["p"] for r in df.select(
        "doc_id", classifier.score_micro(w).alias("p")
    ).collect()}
    for doc_id, xs in ((1, (320000, -100000, 40000)), (2, (-960000, 500000, -1000000))):
        z = w[0] + sum(wj * (x / 1e6) for wj, x in zip(w[1:], xs))
        assert got[doc_id] == round(1e6 / (1 + math.exp(-z)))


def test_oracle_training_twin_matches_spark(spark):
    """DuckDB reruns the full gradient chain from the generated CTEs and
    must land on the same weight doubles Spark trained."""
    feats = _labeled_feats(spark)
    w = classifier.train_logreg(feats, "y", iters=4, lr=1.0)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    sql = classifier.oracle_training_sql(
        classifier.micro_feature_sql(),
        "CAST(x_stop >= 0 AS INT)",
        iters=4,
        lr=1.0,
    )
    got = con.execute(f"{sql} SELECT w0, w1, w2, w3 FROM it4").fetchone()
    assert [abs(a - b) for a, b in zip(got, w)] == pytest.approx(
        [0.0] * 4, abs=1e-15
    )


def test_feature_scan_is_column_pruned_and_shuffle_free(spark):
    """The feature projection is the only pass that touches text, it
    prunes the scan to (doc_id, text), and one training iteration is a
    single partial-combined aggregation — nothing shuffles rows."""
    feats = _labeled_feats(spark)
    assert "text" not in feats.columns
    plan = feats._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "doc_id" in scan and "text" in scan
    # no other documents column survives to the scan
    assert "lang" not in scan and "source" not in scan
    assert "Exchange" not in plan  # pure projection

    # one GD iteration: partial aggregation map-side, no row shuffle
    q = F.expr(classifier.sigmoid_micro_sql([0.0] * 4, classifier.DEFAULT_FEATURES))
    r = q - F.lit(classifier.MICRO) * F.col("y").cast("long")
    agg = feats.agg(F.sum(r).alias("g0"), F.count(F.lit(1)).alias("n"))
    aplan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in aplan or "Partial" in aplan
    # the only exchange is the k+2-long single-partition combine
    assert aplan.count("Exchange") == 1 and "SinglePartition" in aplan


def test_evaluate_counts_and_metrics(spark):
    # 3 TP, 1 FP, 2 FN, 4 TN
    rows = (
        [(1, 1)] * 3 + [(0, 1)] * 1 + [(1, 0)] * 2 + [(0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "y INT, pred INT")
    r = classifier.evaluate(df).collect()[0]
    assert (r.n, r.tp, r.fp, r.fn, r.tn) == (10, 3, 1, 2, 4)
    assert r.accuracy_micro == 700_000
    assert r.precision_micro == 750_000
    assert r.recall_micro == 600_000
    # f1 = 2*3/(2*3+1+2) = 6/9
    assert r.f1_micro == 666_667


def test_evaluate_null_on_degenerate_denominators(spark):
    df = spark.createDataFrame([(0, 0), (0, 0)], "y INT, pred INT")
    r = classifier.evaluate(df).collect()[0]
    assert r.precision_micro is None  # no positive predictions
    assert r.recall_micro is None  # no positive labels
    assert r.f1_micro is None
    assert r.accuracy_micro == 1_000_000


def test_calibration_bins_exact(spark):
    rows = [
        (50_000, 0),  # bin 0
        (149_999, 1),  # bin 1
        (150_001, 0),  # bin 1
        (999_999, 1),  # bin 9
        (1_000_000, 1),  # p = 1.0 folds into the last bin
    ]
    df = spark.createDataFrame(rows, "p_micro BIGINT, y INT")
    out = {r.bin: r for r in classifier.calibration_bins(df).collect()}
    assert set(out) == {0, 1, 9}
    b1 = out[1]
    assert b1.n == 2
    assert b1.mean_p_micro == 150_000
    assert b1.pos_rate_micro == 500_000
    assert b1.gap_micro == 150_000 - 500_000
    b9 = out[9]
    assert b9.n == 2 and b9.pos_rate_micro == 1_000_000


def test_calibration_layout_independent(spark):
    rows = [((i * 37) % 1_000_001, i % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "p_micro BIGINT, y INT")
    a = sorted(map(tuple, classifier.calibration_bins(df).collect()))
    b = sorted(map(tuple, classifier.calibration_bins(df.repartition(7)).collect()))
    assert a == b


def test_calibration_validates_bins(spark):
    df = spark.createDataFrame([(1, 1)], "p_micro BIGINT, y INT")
    with pytest.raises(ValueError):
        classifier.calibration_bins(df, n_bins=1)
