"""Count-min sketch (operators/sketch.py): one-sided error, mergeability,
bounded cell count, unseen-token behavior. Cross-engine bit-exactness of
build + probe is the `cms_token_counts` oracle entry
(tests/test_oracle_parity.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators import sketch  # noqa: E402

DEPTH, WIDTH = 4, 64


def _corpus(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 1)) + " common")
            for i in range(50)]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_cms_never_undercounts_and_is_often_exact(spark):
    docs = _corpus(spark)
    sk = sketch.count_min_build(docs, "text", depth=DEPTH, width=WIDTH)
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    est = sketch.count_min_estimate(
        sk, exact.select("tok"), "tok", depth=DEPTH, width=WIDTH
    )
    both = {r.tok: (r.exact_count, r.est_count)
            for r in exact.join(est, "tok").collect()}
    assert both, "no tokens"
    assert all(e >= x for x, e in both.values()), "CMS undercounted"
    # with 8 distinct tokens in a 4x64 sketch, most cells are collision-free
    assert sum(1 for x, e in both.values() if e == x) >= len(both) - 1


def test_cms_cell_count_is_bounded(spark):
    docs = _corpus(spark)
    sk = sketch.count_min_build(docs, "text", depth=DEPTH, width=WIDTH).collect()
    assert len(sk) <= DEPTH * WIDTH
    assert all(0 <= r.bucket < WIDTH and 0 <= r.row < DEPTH for r in sk)
    # total mass per sketch row equals the token-stream length
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0].n
    per_row = {}
    for r in sk:
        per_row[r.row] = per_row.get(r.row, 0) + r.c
    assert all(v == n_tokens for v in per_row.values())


def test_cms_merge_equals_combined_build(spark):
    a = spark.createDataFrame([(0, "x y x")], "doc_id LONG, text STRING")
    b = spark.createDataFrame([(1, "y z")], "doc_id LONG, text STRING")
    merged = (
        sketch.count_min_build(a, "text", depth=DEPTH, width=WIDTH)
        .unionByName(sketch.count_min_build(b, "text", depth=DEPTH, width=WIDTH))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    combined = sketch.count_min_build(
        a.unionByName(b), "text", depth=DEPTH, width=WIDTH
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, combined.collect())
    )


def test_cms_unseen_token_estimates_zero_on_sparse_sketch(spark):
    docs = spark.createDataFrame([(0, "only these words")],
                                 "doc_id LONG, text STRING")
    sk = sketch.count_min_build(docs, "text", depth=DEPTH, width=WIDTH)
    probes = spark.createDataFrame([("nevermore",)], "tok STRING")
    got = sketch.count_min_estimate(
        sk, probes, "tok", depth=DEPTH, width=WIDTH
    ).collect()
    # 3 distinct tokens in 4x64 cells: all 4 probe cells colliding is
    # impossible unless the hash maps the probe onto occupied cells in
    # every row — with 3/64 occupancy this fixture is deterministic-safe
    assert got == [("nevermore", 0)] or got[0].est_count >= 0
    assert got[0].est_count == 0


def test_cms_probe_broadcasts_sketch(spark):
    docs = _corpus(spark)
    sk = sketch.count_min_build(docs, "text", depth=DEPTH, width=WIDTH)
    probes = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    est = sketch.count_min_estimate(sk, probes, "tok", depth=DEPTH, width=WIDTH)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_cms_streaming_build_equals_batch(spark, tmp_path):
    """The sketch build is a plain groupBy-count plan, so it runs
    unchanged over a file stream (complete output mode): after all
    files are consumed, the streamed sketch must equal the batch build
    over the union — the repo's batch-exact-twin discipline, and the
    shape a CDC pipeline uses to keep a LIVE token-frequency sketch."""
    d = tmp_path / "docs"
    d.mkdir()
    a = spark.createDataFrame([(0, "x y x"), (1, "y z")],
                              "doc_id LONG, text STRING")
    b = spark.createDataFrame([(2, "z z w")], "doc_id LONG, text STRING")
    a.coalesce(1).write.parquet(str(d / "p1"))
    b.coalesce(1).write.parquet(str(d / "p2"))

    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "p*"))
    )
    q = (
        sketch.count_min_build(stream, "text", depth=DEPTH, width=WIDTH)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT row, bucket, c FROM cms_stream_t").collect())
    )
    batch = sorted(
        map(
            tuple,
            sketch.count_min_build(
                a.unionByName(b), "text", depth=DEPTH, width=WIDTH
            ).collect(),
        )
    )
    assert streamed == batch


# ---------------------------------------------------------------------------
# HyperLogLog


def _hll_py_registers(items, m):
    """Pure-Python replay of hll_build's register set: md5-prefix bucket,
    leading-zero-bit rho over the next 48 bits. Independent of both
    engines — the ground truth the Spark build must equal exactly."""
    import hashlib

    regs = {}
    for it in items:
        h = hashlib.md5((str(it) + ":hll").encode()).hexdigest()
        bucket = int(h[:12], 16) % m
        tailbits = int(h[12:24], 16)
        rho = 49 if tailbits == 0 else 48 - tailbits.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_pure_python_replay(spark):
    m = 64
    items = [f"url-{i}" for i in range(500)]
    df = spark.createDataFrame([(x,) for x in items], "item STRING")
    got = {r.bucket: r.r for r in sketch.hll_build(df, "item", m=m).collect()}
    assert got == _hll_py_registers(items, m)


def test_hll_register_count_is_bounded_and_rho_in_range(spark):
    m = 32
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(10_000)], "item STRING"
    )
    regs = sketch.hll_build(df, "item", m=m).collect()
    assert len(regs) <= m
    assert all(0 <= r.bucket < m and 1 <= r.r <= 49 for r in regs)


def test_hll_merge_equals_combined_build(spark):
    m = 64
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "item STRING")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(150, 450)], "item STRING"
    )
    merged = sketch.hll_merge(
        sketch.hll_build(a, "item", m=m), sketch.hll_build(b, "item", m=m)
    )
    combined = sketch.hll_build(a.unionByName(b), "item", m=m)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, combined.collect())
    )


def test_hll_estimate_accuracy_raw_branch(spark):
    """20k distinct keys at m=1024 exercises the harmonic-mean branch
    (no zero registers survive, or E > 2.5m); the estimate must land
    within 4 standard errors (4 * 1.04 / sqrt(1024) ≈ 13%)."""
    m = 1024
    n = 20_000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "item STRING")
    sk = sketch.hll_build(df, "item", m=m)
    row = sketch.hll_estimate(sk, m=m).collect()[0]
    assert abs(row.est_distinct - n) / n < 4 * 1.04 / (m**0.5)


def test_hll_estimate_small_range_branch_is_near_exact(spark):
    """A 40-distinct corpus at m=1024 forces linear counting (zeros > 0,
    E ≤ 2.5m): with so few keys the estimate is exact unless two keys
    share a register, so it may only undershoot, and by at most a few."""
    m = 1024
    df = spark.createDataFrame([(f"v{i}",) for i in range(40)], "item STRING")
    row = sketch.hll_estimate(sketch.hll_build(df, "item", m=m), m=m).collect()[0]
    assert row.zeros > 0
    assert 36 <= row.est_distinct <= 40


def test_hll_grouped_build_and_estimate(spark):
    m = 256
    rows = [(f"g{i % 2}", f"item{i}") for i in range(2_000)]
    df = spark.createDataFrame(rows, "grp STRING, item STRING")
    sk = sketch.hll_build(df, "item", m=m, group_cols=("grp",))
    est = {
        r.grp: r.est_distinct
        for r in sketch.hll_estimate(sk, m=m, group_cols=("grp",)).collect()
    }
    assert set(est) == {"g0", "g1"}
    for v in est.values():
        assert abs(v - 1000) / 1000 < 4 * 1.04 / (m**0.5)


def test_hll_build_plan_is_single_aggregation(spark):
    """The build must stay a scan → project → hash-aggregate plan: no
    joins, no windows, no Python — the map-side combine collapsing to
    ≤ m rows per task is the operator's entire scale story."""
    df = spark.createDataFrame([("a",), ("b",)], "item STRING")
    plan = (
        sketch.hll_build(df, "item", m=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Window", "BatchEvalPython", "CartesianProduct"):
        assert bad not in plan, f"{bad} in hll_build plan"


def test_hll_streaming_build_equals_batch(spark, tmp_path):
    """hll_build is a plain groupBy-max plan, so it runs unchanged over
    a file stream (complete output mode): after all files are consumed
    the streamed registers must equal the batch build over the union —
    the batch-exact-twin discipline, and the shape a CDC pipeline uses
    to keep a LIVE distinct-URL register set."""
    d = tmp_path / "items"
    d.mkdir()
    a = spark.createDataFrame([(f"u{i}",) for i in range(40)], "item STRING")
    b = spark.createDataFrame([(f"u{i}",) for i in range(20, 70)], "item STRING")
    a.coalesce(1).write.parquet(str(d / "p1"))
    b.coalesce(1).write.parquet(str(d / "p2"))

    stream = (
        spark.readStream.schema("item STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "p*"))
    )
    q = (
        sketch.hll_build(stream, "item", m=64)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT bucket, r FROM hll_stream_t").collect())
    )
    batch = sorted(
        map(tuple, sketch.hll_build(a.unionByName(b), "item", m=64).collect())
    )
    assert streamed == batch


def test_hll_null_items_count_as_no_item(spark):
    """Review finding: NULL items must behave like countDistinct —
    excluded, never a NULL-bucket register."""
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "item STRING"
    )
    regs = sketch.hll_build(df, "item", m=64).collect()
    assert all(r.bucket is not None and r.r is not None for r in regs)
    est = sketch.hll_estimate(sketch.hll_build(df, "item", m=64), m=64)
    assert est.collect()[0].est_distinct == 2


def test_hll_merge_preserves_groups_and_validates_schema(spark):
    """Review finding: merging grouped sketches must keep the group
    columns (inferred from the schema), and mismatched schemas raise."""
    import pytest as _pytest

    a = spark.createDataFrame([("g0", f"a{i}") for i in range(50)],
                              "grp STRING, item STRING")
    b = spark.createDataFrame([("g1", f"b{i}") for i in range(50)],
                              "grp STRING, item STRING")
    sa = sketch.hll_build(a, "item", m=64, group_cols=("grp",))
    sb = sketch.hll_build(b, "item", m=64, group_cols=("grp",))
    merged = sketch.hll_merge(sa, sb)
    assert "grp" in merged.columns
    assert {r.grp for r in merged.select("grp").distinct().collect()} == {"g0", "g1"}
    combined = sketch.hll_build(
        a.unionByName(b), "item", m=64, group_cols=("grp",)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, combined.collect())
    )
    with _pytest.raises(ValueError):
        sketch.hll_merge(sa, sb.drop("grp"))
    with _pytest.raises(ValueError):
        sketch.hll_merge(sa, sb, group_cols=("lang",))


def test_hll_m_bound_is_enforced(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a",)], "item STRING")
    for bad in (0, -1, 8193, 65536):
        with _pytest.raises(ValueError):
            sketch.hll_build(df, "item", m=bad)
        with _pytest.raises(ValueError):
            sketch.hll_estimate(df, m=bad)
    with _pytest.raises(ValueError):
        sketch.hll_oracle_sql("t", "item", m=0)
