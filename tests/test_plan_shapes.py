"""Physical-plan regression tests: pin the scale-critical plan properties
(the brief's checklist — filters reach the parquet scan, scans are
column-pruned, small dims broadcast, top-k avoids a global sort, and
aggregations partial-combine map-side). A refactor that silently loses
one of these passes value checks but dies at 100 TB; these tests make
that a red build instead."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # filter reaches the scan
    assert "PushedFilters" in scan and "l_shipdate" in scan.split("PushedFilters")[1]
    # pruned: the 7 referenced columns only — never l_orderkey/l_comment/...
    assert "l_comment" not in scan and "l_orderkey" not in scan
    # map-side partial aggregation before the shuffle
    assert "partial_sum" in plan


def test_q3_broadcasts_dimensions_no_sort_for_topk(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "CartesianProduct" not in plan


def test_topk_is_take_ordered(spark):
    plan = _plan(spark, "topk_parts")
    assert "TakeOrderedAndProject" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "p_comment" not in scan  # projection pruned to 3 columns


def test_lww_state_partial_aggregates(spark):
    """The CDC LWW primitive must partial-combine map-side (the property
    that eats hot-key skew before the shuffle)."""
    plan = _plan(spark, "events_lww_state")
    assert "partial_max_by" in plan


def test_exact_dedup_partial_aggregates(spark):
    plan = _plan(spark, "dedup_exact_documents")
    assert "partial_min" in plan or "partial_count" in plan


def test_mor_apply_never_scans_the_table(spark, tmp_path, monkeypatch):
    """The O(batch)-not-O(table) claim, pinned at the plan level: a MOR
    delta append's write plan reads the incoming CSV batch ONLY — no
    parquet scan of existing table data, even when the table already has
    committed batches."""
    from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
    from csv_cruncher_spark.cdc.pipeline import CdcPipeline
    from csv_cruncher_spark.lake.table import LakeTable

    generate_change_log(
        ChangeLogSpec(n_urls=60, n_batches=3, events_per_batch=80, seed=17,
                      out_dir=str(tmp_path / "batches"))
    )
    plans = []
    orig = LakeTable.write_bucket_data

    def spy(self, df, *a, **k):
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return orig(self, df, *a, **k)

    monkeypatch.setattr(LakeTable, "write_bucket_data", spy)
    CdcPipeline(str(tmp_path / "lake"), n_buckets=2, compact_every=10**6).run(
        spark, str(tmp_path / "batches")
    )
    assert len(plans) == 3
    # batches 2 and 3 apply onto a NON-EMPTY table and still only scan csv
    for plan in plans:
        assert "FileScan csv" in plan
        assert "FileScan parquet" not in plan


def test_line_filter_ingest_has_single_exchange(spark, tmp_path):
    """The line-filter path's only SHUFFLE is the range exchange on the
    discovery file index, which the per-file window then reuses (its
    ClusteredDistribution(__fi) is satisfied by RangePartitioning(__fi)).
    Round-2 flagged a redundant second exchange from a global orderBy —
    still pinned gone; round-3 flagged hash-of-path partition order as
    file-order nondeterministic — the shuffle must now be the RANGE one,
    and the file→index map must ride a broadcast, not a shuffle."""
    from csv_cruncher_spark.crunch import Cruncher, ExportSpec, ImportSpec, Options

    src = tmp_path / "log.csv"
    src.write_text("id,val\n1,keep\nJUNK,drop\n2,keep\n")
    opts = Options(
        imports=[ImportSpec(path=str(src), ignore_line_regex="JUNK.*")],
        exports=[ExportSpec(path=str(tmp_path / "out.csv"))],
        sql="SELECT id, val FROM log",
    )
    c = Cruncher(opts)
    tables = c._load_tables(spark)
    plan = tables[0].df._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert shuffles == 1, plan
    assert "Exchange rangepartitioning" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_line_filter_multi_file_concatenates_in_discovery_order(spark, tmp_path):
    """Round-3 advice: hash-of-file-path partitioning broke cross-file row
    order on the line-filter path — multi-file imports must concatenate in
    discovery-sorted file order (the reference's semantics) and
    crunchCounter numbering must follow it deterministically. Files are
    named so hash order ≠ lexicographic order for most hash choices, and
    the whole pipeline (ingest → counter → coalesce(1) export) is
    exercised."""
    from csv_cruncher_spark.crunch import Cruncher, ExportSpec, ImportSpec, Options

    d = tmp_path / "in"
    d.mkdir()
    expect = []
    for fi in range(6):
        lines = ["id,val"]
        for r in range(3):
            lines.append(f"x{fi}{r},f{fi}")
            expect.append(f"x{fi}{r},f{fi}")
        (d / f"part_{fi:02d}.csv").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.csv"
    opts = Options(
        imports=[ImportSpec(path=str(d), ignore_line_regex="NOPE.*")],
        exports=[ExportSpec(path=str(out))],
        sql="SELECT id, val FROM in",
        row_numbers=1,
    )
    Cruncher(opts).run(spark)
    got = out.read_text().strip().splitlines()
    assert got[0] == "crunchCounter,id,val"
    body = [",".join(r.split(",")[1:]) for r in got[1:]]
    assert body == expect, body
    assert [r.split(",")[0] for r in got[1:]] == [str(i) for i in range(1, 19)]


def test_narrow_read_winner_fold_computed_once(spark, tmp_path):
    """The narrow read's winner fold feeds two broadcast branches whose
    differing filters defeat ReuseExchange — without a materialization
    boundary the fold (and every delta scan under it) ran TWICE.
    Pinned: the executed plan contains no inline collect_list fold
    (it runs once inside the checkpoint's job) and resolution output is
    unchanged."""
    from csv_cruncher_spark.cdc.fixtures import ChangeLogSpec, generate_change_log
    from csv_cruncher_spark.cdc.pipeline import CdcPipeline
    from csv_cruncher_spark.lake.table import LakeTable

    generate_change_log(
        ChangeLogSpec(n_urls=80, n_batches=3, events_per_batch=120, seed=23,
                      out_dir=str(tmp_path / "batches"))
    )
    CdcPipeline(str(tmp_path / "lake"), n_buckets=2, compact_every=10**6).run(
        spark, str(tmp_path / "batches")
    )
    t = LakeTable.load(str(tmp_path / "lake"))
    orig = LakeTable.RESOLVE_MODE
    try:
        LakeTable.RESOLVE_MODE = "narrow"
        df = t.read(spark)
        state = {(r["url"], r["text"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("collect_list") == 0, plan
        LakeTable.RESOLVE_MODE = "widefold"
        assert {(r["url"], r["text"]) for r in t.read(spark).collect()} == state
    finally:
        LakeTable.RESOLVE_MODE = orig


def test_knn_join_probe_is_equi_join_not_cartesian(spark):
    """The approximate k-NN join's candidate stage must be an equi-join
    on the probed cell id — never a cross join over left×right."""
    from csv_cruncher_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    left = emb.select((emb.vec_id + 1000000).alias("id_l"), "embedding").limit(20)
    right = emb.select(emb.vec_id.alias("id_r"), "embedding")
    j = similarity.knn_join(
        left, right, "id_l", "id_r", "embedding", "embedding",
        k=3, n_centroids=8, n_probe=2,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_shingles_binds_token_array_once(spark):
    """Regression pin for the O(tokens²) shingle trap: the split() call
    must appear exactly once in the projected expression (bound as a
    lambda variable), not inside the per-index lambda where it would
    re-evaluate per shingle (measured 26× wall at 64× doc length)."""
    from pyspark.sql import functions as F

    from csv_cruncher_spark.operators.dedup import shingles
    from csv_cruncher_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame([("a b c d e",)], "text string")
    expr_str = str(shingles("text", 3)._jc)
    assert expr_str.count("split(") == 1
    # and the bigram site of repetition_stats
    rs = repetition_stats(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string"),
        "doc_id", "text",
    )
    plan = rs._jdf.queryExecution().analyzed().toString()
    gen = [l for l in plan.splitlines() if "Generate" in l and "transform" in l]
    for line in gen:
        assert line.count("split(") <= 1, line
