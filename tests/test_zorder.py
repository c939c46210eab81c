"""Z-order layout (lake/zorder.py): interleave correctness, cross-engine
formula parity, pruning superiority over lexicographic layout on
minor-dimension boxes, layout plan shape, validation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.lake import zorder


def test_z_value_hand_computed(spark):
    df = spark.createDataFrame([(0b10, 0b01)], "x long, y long")
    z = df.select(zorder.z_value(["x", "y"], bits=2).alias("z")).collect()[0].z
    # pos0 = x bit0 = 0, pos1 = y bit0 = 1, pos2 = x bit1 = 1, pos3 = y bit1 = 0
    assert z == 0b0110

    df2 = spark.createDataFrame([(255, 255)], "x long, y long")
    z2 = df2.select(zorder.z_value(["x", "y"], bits=8).alias("z")).collect()[0].z
    assert z2 == (1 << 16) - 1

    # three dimensions: bit b of col i lands at b*3 + i
    df3 = spark.createDataFrame([(1, 1, 1)], "a long, b long, c long")
    z3 = df3.select(zorder.z_value(["a", "b", "c"], bits=1).alias("z")).collect()[0].z
    assert z3 == 0b111


def test_sql_twin_bit_parity(spark):
    rows = [(i, (i * 37 + 11) % 256, (i * 101 + 3) % 256) for i in range(300)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r.i: r.z
        for r in df.select(
            "i", zorder.z_value(["x", "y"], bits=8).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    expr = zorder.z_value_sql(["x", "y"], bits=8)
    want = dict(
        con.execute(
            "SELECT i, "
            + expr
            + " FROM (SELECT unnest($1::BIGINT[]) i, unnest($2::BIGINT[]) x,"
              " unnest($3::BIGINT[]) y)",
            [
                [r[0] for r in rows],
                [r[1] for r in rows],
                [r[2] for r in rows],
            ],
        ).fetchall()
    )
    assert got == want


def test_null_dimension_yields_null_z(spark):
    df = spark.createDataFrame([(1, None)], "x long, y long")
    assert df.select(zorder.z_value(["x", "y"], 4).alias("z")).collect()[0].z is None


def test_pruning_zorder_beats_lex_on_minor_dim(spark):
    # full 64x64 grid; box selects the low 1/8 of y (the minor lex dim)
    grid = spark.range(64 * 64).select(
        (F.col("id") / 64).cast("long").alias("x"),
        (F.col("id") % 64).alias("y"),
    )
    rep = {
        r.layout: r
        for r in zorder.pruning_report(
            grid, ["x", "y"], {"y": (0, 7)}, bits=6, bucket_bits=4
        ).collect()
    }
    zo, lex = rep["zorder"], rep["lex"]
    assert zo.rows_total == lex.rows_total == 64 * 64
    # lex layout (x major): every bucket spans all y -> reads everything
    assert lex.buckets_touched == lex.n_buckets
    # morton layout: only the buckets whose y-envelope meets [0,8) — 1/4
    # of the 16 buckets at these parameters (y's top 2 bits are 00)
    assert zo.buckets_touched == 4
    assert zo.rows_touched == 64 * 64 // 4
    # exact-cover sanity: every matching row is inside touched buckets
    assert zo.rows_touched >= 64 * 8 and lex.rows_touched >= 64 * 8


def test_zorder_layout_single_range_shuffle_preserves_rows(spark):
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), ((F.col("id") * 7) % 32).alias("y"),
        F.col("id").alias("payload"),
    )
    out = zorder.zorder_layout(df, ["x", "y"], bits=5, n_files=4)
    assert out.count() == 1000
    assert out.columns == ["x", "y", "payload"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    assert "hashpartitioning" not in plan


def test_validation():
    with pytest.raises(ValueError):
        zorder.z_value(["x"], 8)
    with pytest.raises(ValueError):
        zorder.z_value(["x", "y"], 32)  # 64 bits > 62
    with pytest.raises(ValueError):
        zorder.z_value_sql(["x", "y"], 0)


def test_pruning_report_validation(spark):
    df = spark.range(4).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match="not in z-order"):
        zorder.pruning_report(df, ["x", "y"], {"q": (0, 1)})
    with pytest.raises(ValueError, match="bucket_bits"):
        zorder.pruning_report(df, ["x", "y"], {"x": (0, 1)}, bits=4, bucket_bits=9)


def test_compact_zorder_by_preserves_view_and_clusters_files(spark, tmp_path):
    """OPTIMIZE ZORDER on the lake: compact(zorder_by=...) must not
    change the resolved view, and the rewritten base files must be
    physically ordered by the Morton code of the requested dimensions."""
    import base64
    import csv as _csv
    import os

    from csv_cruncher_spark.cdc.pipeline import CdcPipeline
    from csv_cruncher_spark.lake.table import LakeTable

    bdir = str(tmp_path / "batches")
    os.makedirs(bdir)
    with open(os.path.join(bdir, "batch-00000.csv"), "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        for i in range(200):
            w.writerow({
                "op": "I", "url": f"https://d{i % 7}.example/p{i}",
                "warc_ts": f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}",
                "html": base64.b64encode(f"<html><body>doc {i}</body></html>".encode()).decode(),
                "lang": "en",
            })
    tpath = str(tmp_path / "lake")
    CdcPipeline(tpath, n_buckets=2).run(spark, bdir)
    t = LakeTable.load(tpath)
    before = sorted(
        (r.url, str(r.warc_ts)) for r in t.read(spark).select("url", "warc_ts").collect()
    )
    dims = [
        F.unix_timestamp("warc_ts") % 256,
        F.abs(F.hash("url")) % 256,
    ]
    snap = t.compact(spark, zorder_by=dims, zorder_bits=8)
    after = sorted(
        (r.url, str(r.warc_ts)) for r in t.read(spark).select("url", "warc_ts").collect()
    )
    assert after == before
    base_files = [f for f in snap["files"] if f["kind"] == "base"]
    assert base_files
    for entry in base_files:
        one = spark.read.parquet(os.path.join(tpath, entry["path"]))
        zs = [
            r.z
            for r in one.select(
                zorder.z_value(dims, bits=8).alias("z")
            ).collect()
        ]
        assert zs == sorted(zs), f"file {entry['path']} not z-ordered"
