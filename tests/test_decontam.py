"""Test-set decontamination (operators/decontam.py): semantics against
hand-built fixtures, amortized benchmark-ngram reuse, and the scale
contract — the corpus n-gram stream must meet the benchmark set through
a BROADCAST join with no corpus-side exchange before it."""

from pyspark.sql import Row

from csv_cruncher_spark.operators import decontam

DOCS = [
    # exactly the benchmark sentence → contaminated
    (1, "alpha beta gamma delta epsilon zeta"),
    # contains the benchmark run inside longer text → contaminated
    (2, "prefix words alpha beta gamma delta epsilon zeta suffix words"),
    # shares only a 2-word overlap → clean at n=3
    (3, "unrelated alpha beta content entirely different here"),
    # clean
    (4, "nothing in common with the benchmark at all"),
    # short doc (< n words) equal to a short benchmark doc → contaminated
    (5, "tiny doc"),
]
BENCH = [
    (100, "alpha beta gamma delta epsilon zeta"),
    (101, "tiny doc"),
]


def _frames(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    bench = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in BENCH])
    return docs, bench


def test_contamination_report_semantics(spark):
    docs, bench = _frames(spark)
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=3)
    got = {r["id"]: r["n_hit_ngrams"] for r in rep.collect()}
    # doc1: all 4 of its 3-grams are benchmark 3-grams
    assert got[1] == 4
    # doc2: the embedded 6-word run contributes the same 4 grams
    assert got[2] == 4
    # doc5: whole-text gram (short-doc slice semantics) matches bench doc 101
    assert got[5] == 1
    assert 3 not in got and 4 not in got


def test_decontaminate_removes_hits_keeps_schema(spark):
    docs, bench = _frames(spark)
    out = decontam.decontaminate(docs, bench, "doc_id", "text", n=3)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4]
    assert out.columns == docs.columns


def test_min_hits_threshold(spark):
    docs, bench = _frames(spark)
    # require >= 5 distinct hit grams: nothing reaches it, all docs survive
    out = decontam.decontaminate(docs, bench, "doc_id", "text", n=3, min_hits=5)
    assert out.count() == len(DOCS)


def test_precomputed_bench_ngrams_reused(spark):
    docs, bench = _frames(spark)
    bn = decontam.benchmark_ngrams(bench, "text", n=3)
    rep = decontam.contamination_report(
        docs, bench.limit(0), "doc_id", "text", n=3, bench_ngrams=bn
    )
    # report built from the precomputed set, not the (empty) bench frame
    assert rep.count() == 3


def test_case_insensitive(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="Alpha BETA gamma")])
    bench = spark.createDataFrame([Row(doc_id=2, text="alpha beta GAMMA")])
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=3)
    assert rep.count() == 1


def test_plan_broadcast_no_corpus_shuffle(spark):
    """The 100-TB contract: benchmark side broadcasts; the corpus side of
    the screen join reaches it without an exchange (explode is narrow)."""
    docs, bench = _frames(spark)
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=3)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # nothing between the corpus scan and the broadcast join shuffles:
    # the only exchange in the plan is the final per-doc aggregation,
    # which sits ABOVE the join in the plan text
    probe = plan.split("BroadcastHashJoin")[1]
    corpus_branch = probe.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_branch, plan
