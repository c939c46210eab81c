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


def test_embedding_contamination_report_semantics(spark):
    """Cosine screen: identical direction flags at 1.0, orthogonal stays
    clean, the arg-max benchmark id is the highest-cosine match with the
    LOWEST-id tie-break, and zero-norm vectors never flag (null cosine,
    not NaN)."""
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),   # == bench 100 dir
            Row(vec_id=2, embedding=[0.0, 2.0]),   # orthogonal to 100, == 101
            Row(vec_id=3, embedding=[1.0, 1.0]),   # cos .707107 to both -> tie
            Row(vec_id=4, embedding=[0.0, 0.0]),   # zero norm -> never flags
            Row(vec_id=5, embedding=[-1.0, 0.0]),  # negative cos -> clean
        ]
    )
    bench = spark.createDataFrame(
        [Row(vec_id=100, embedding=[2.0, 0.0]), Row(vec_id=101, embedding=[0.0, 1.0])]
    )
    out = decontam.embedding_contamination_report(
        corpus, bench, id_col="vec_id", vec_col="embedding", threshold=0.5
    )
    got = {r["id"]: (r["bench_id"], r["max_cosine"]) for r in out.collect()}
    assert got[1] == (100, 1.0)
    assert got[2] == (101, 1.0)
    # exact raw-double tie: 2.0/(sqrt(2)*2.0) == 1.0/sqrt(2) bitwise in
    # IEEE (scaling num+den by a power of two) -> lowest bench id wins
    assert got[3] == (100, 0.707107)
    assert 4 not in got and 5 not in got


def test_embedding_contamination_report_broadcasts_bench(spark):
    """Scale contract: the benchmark side reaches the pairing through a
    broadcast — the corpus vectors never shuffle."""
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(50)]
    )
    bench = spark.createDataFrame([Row(vec_id=1000, embedding=[1.0, 1.0])])
    out = decontam.embedding_contamination_report(
        corpus, bench, id_col="vec_id", vec_col="embedding", threshold=0.9
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # the only exchange in the plan is the tiny hits frame entering the
    # arg-max window — the corpus scan side must feed the join directly
    pre_join = plan.split("Join")[-1]  # subtree below the join
    assert "Exchange hashpartitioning" not in pre_join, plan
    assert out.count() > 0
