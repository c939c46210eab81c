"""As-of join semantics (operators/joins.py): inclusive/strict time
matching, left rows without matches, per-key isolation, and the
one-shuffle plan shape."""

from pyspark.sql import functions as F

from csv_cruncher_spark.operators.joins import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 10, "p1"), ("a", 20, "p2"), ("a", 5, "p0"), ("b", 7, "p3")],
        "k: string, t: long, pid: string",
    )
    right = spark.createDataFrame(
        [("a", 10, "v10"), ("a", 15, "v15"), ("a", 1, "v1"), ("c", 3, "vc")],
        "k: string, t: long, vid: string",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(left, right, on="k", left_time="t").collect()
    }
    assert got == {
        "p0": "v1",    # 5 -> right at 1
        "p1": "v10",   # 10 -> right at 10 (inclusive <=)
        "p2": "v15",   # 20 -> right at 15
        "p3": None,    # key b has no right rows
    }


def test_asof_strict(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(left, right, on="k", left_time="t", strict=True).collect()
    }
    assert got["p1"] == "v1"  # strict <: the t=10 right row is excluded


def test_asof_carries_right_time_and_columns(spark):
    left, right = _frames(spark)
    row = {
        r["pid"]: (r["r_t"], r["r_vid"])
        for r in asof_join(left, right, on="k", left_time="t").collect()
    }
    assert row["p2"] == (15, "v15")
    assert row["p3"] == (None, None)


def test_asof_single_shuffle(spark):
    """The union-and-carry plan shuffles ONCE on the key (window exchange);
    no range join, no cross product."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", left_time="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_null_time_right_rows_never_match(spark):
    """A right row with a null time can never satisfy l.ts >= r.ts; it
    must not be carried as a bogus 'earliest' match (Spark's nulls-first
    sort would otherwise attach it to every left row before the first
    real right row)."""
    left = spark.createDataFrame(
        [("a", 5, "p0"), ("a", 20, "p2")], "k: string, t: long, pid: string"
    )
    right = spark.createDataFrame(
        [("a", None, "vnull"), ("a", 10, "v10")], "k: string, t: long, vid: string"
    )
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(left, right, on="k", left_time="t").collect()
    }
    assert got == {"p0": None, "p2": "v10"}


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(
            left, right, on="k", left_time="t", direction="forward"
        ).collect()
    }
    assert got == {
        "p0": "v10",   # 5 -> earliest right at 10
        "p1": "v10",   # 10 -> right at 10 (inclusive >=)
        "p2": None,    # 20 -> no later right row
        "p3": None,    # key b has no right rows
    }


def test_asof_forward_strict(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(
            left, right, on="k", left_time="t", direction="forward", strict=True
        ).collect()
    }
    assert got["p1"] == "v15"  # strict >: the t=10 right row is excluded


def test_asof_tolerance_numeric(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(
            left, right, on="k", left_time="t", tolerance=4
        ).collect()
    }
    assert got == {
        "p0": "v1",    # 5-1=4 <= 4 kept
        "p1": "v10",   # distance 0
        "p2": None,    # 20-15=5 > 4 -> nulled
        "p3": None,
    }


def test_asof_tolerance_timestamp_interval(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", "p1"), ("a", "2024-01-01 01:00:00", "p2")],
        "k: string, ts: string, pid: string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:05:00", "v5")], "k: string, ts: string, vid: string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(
            left, right, on="k", left_time="ts",
            tolerance=F.expr("INTERVAL '10' MINUTE"),
        ).collect()
    }
    assert got == {"p1": "v5", "p2": None}  # 55 min > 10 min -> nulled


def test_asof_null_keys_never_match(spark):
    """SQL join semantics (and DuckDB ASOF): NULL keys never match —
    a null-key left row must not be attached to a null-key right row."""
    left = spark.createDataFrame(
        [(None, 10, "pnull"), ("a", 10, "pa")], "k: string, t: long, pid: string"
    )
    right = spark.createDataFrame(
        [(None, 5, "vnull"), ("a", 5, "va")], "k: string, t: long, vid: string"
    )
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join(left, right, on="k", left_time="t").collect()
    }
    assert got == {"pnull": None, "pa": "va"}


def test_asof_map_payload_raises(spark):
    left, right = _frames(spark)
    bad = right.withColumn("m", F.create_map(F.lit("x"), F.lit(1)))
    import pytest as _pytest

    with _pytest.raises(TypeError, match="map-typed"):
        asof_join(left, bad, on="k", left_time="t")


def test_asof_bucketed_matches_plain(spark):
    """Property: the skew-resistant time-bucketed as-of join is
    bit-identical to the plain union-and-carry join — including a hot key
    with many events, sparse keys whose buckets are far apart, equal
    timestamps, empty buckets between events, and strict mode."""
    import random

    from csv_cruncher_spark.operators.joins import asof_join_bucketed

    rnd = random.Random(123)
    keys = ["hot"] * 400 + ["a", "b", "c"] * 30
    left_rows = [
        (k, rnd.randrange(0, 10_000), f"p{i}") for i, k in enumerate(keys)
    ]
    right_rows = [
        (rnd.choice(["hot", "a", "b", "z"]), rnd.randrange(0, 10_000), f"v{i}")
        for i in range(300)
    ]
    left = spark.createDataFrame(left_rows, "k: string, t: long, pid: string")
    right = spark.createDataFrame(right_rows, "k: string, t: long, vid: string")
    for strict in (False, True):
        plain = {
            r["pid"]: (r["r_t"], r["r_vid"])
            for r in asof_join(left, right, on="k", left_time="t", strict=strict).collect()
        }
        for width in (100, 1000, 100_000):
            got = {
                r["pid"]: (r["r_t"], r["r_vid"])
                for r in asof_join_bucketed(
                    left, right, on="k", left_time="t",
                    bucket_width=width, strict=strict,
                ).collect()
            }
            assert got == plain, (strict, width)


def test_asof_bucketed_timestamp_type(spark):
    from csv_cruncher_spark.operators.joins import asof_join_bucketed

    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", "p1"), ("a", "2024-03-01 00:00:00", "p2")],
        "k: string, ts: string, pid: string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 09:00:00", "v9"), ("a", "2024-02-01 00:00:00", "vfeb")],
        "k: string, ts: string, vid: string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["pid"]: r["r_vid"]
        for r in asof_join_bucketed(
            left, right, on="k", left_time="ts", bucket_width=3600
        ).collect()
    }
    assert got == {"p1": "v9", "p2": "vfeb"}
