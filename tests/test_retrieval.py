"""BM25 retrieval (operators/retrieval.py): semantics on a hand-checkable
corpus, determinism under repartitioning, tie/edge contracts."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "spark shuffle join"),                      # short, has rare term
        ("d2", "spark spark spark filter filter window"),  # tf-heavy on common
        ("d3", "window filter sort sort sort sort"),       # long, no 'spark'
        ("d4", "shuffle"),                                 # shortest, rare term
        ("d5", ""),                                        # token-less
    ]
    return spark.createDataFrame(rows, "doc_id STRING, text STRING")


def _hits(df):
    return [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_rare_term_outranks_common(spark, corpus):
    q = spark.createDataFrame(
        [("q1", "shuffle"), ("q2", "filter")],
        "query_id STRING, query_text STRING",
    )
    out = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=10)
    got = _hits(out)
    by_q = {}
    for qid, rank, doc, score in got:
        by_q.setdefault(qid, []).append((rank, doc, score))
    # 'shuffle' (df=2) matches d1 and d4 only; d4 is shorter -> higher
    # length-normalized score
    assert [d for _, d, _ in by_q["q1"]] == ["d4", "d1"]
    # 'filter' matches d2 (tf=2) and d3 (tf=1); d2 wins on tf
    assert [d for _, d, _ in by_q["q2"]] == ["d2", "d3"]
    # scores are positive int64 micro-units
    assert all(isinstance(s, int) and s > 0 for q_ in by_q.values() for _, _, s in q_)


def test_multi_token_query_sums_terms(spark, corpus):
    q = spark.createDataFrame(
        [("q", "spark shuffle"), ("qa", "spark"), ("qb", "shuffle")],
        "query_id STRING, query_text STRING",
    )
    out = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=10).collect()
    score = {(r.query_id, r.doc_id): r.score_micro for r in out}
    # d1 matches both tokens: its combined score is the exact int sum of
    # its single-token scores (per-token terms are rounded once, then
    # summed exactly)
    assert score[("q", "d1")] == score[("qa", "d1")] + score[("qb", "d1")]


def test_query_token_distinct(spark, corpus):
    q = spark.createDataFrame(
        [("once", "spark"), ("thrice", "spark spark spark")],
        "query_id STRING, query_text STRING",
    )
    out = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=10).collect()
    score = {(r.query_id, r.doc_id): r.score_micro for r in out}
    assert score[("once", "d1")] == score[("thrice", "d1")]


def test_k_bounds_and_rank_order(spark, corpus):
    q = spark.createDataFrame(
        [("q", "spark filter window sort shuffle join")],
        "query_id STRING, query_text STRING",
    )
    out = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=2)
    got = _hits(out)
    assert len(got) == 2
    assert [r for _, r, _, _ in got] == [1, 2]
    assert got[0][3] >= got[1][3]  # score non-increasing with rank


def test_no_match_and_empty_text(spark, corpus):
    q = spark.createDataFrame(
        [("gone", "zzzz qqqq")], "query_id STRING, query_text STRING"
    )
    out = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=5)
    assert out.count() == 0


def test_layout_independence(spark, corpus):
    q = spark.createDataFrame(
        [("q", "spark filter shuffle")], "query_id STRING, query_text STRING"
    )
    a = _hits(retrieval.bm25_topk(corpus, "doc_id", "text", q, k=10))
    b = _hits(
        retrieval.bm25_topk(corpus.repartition(7), "doc_id", "text", q, k=10)
    )
    c = _hits(
        retrieval.bm25_topk(corpus.coalesce(1), "doc_id", "text", q, k=10)
    )
    assert a == b == c


def test_tie_breaks_on_doc_id(spark):
    # two identical docs -> identical scores; rank order must be id asc
    rows = [("b", "alpha beta"), ("a", "alpha beta"), ("c", "gamma")]
    docs = spark.createDataFrame(rows, "doc_id STRING, text STRING")
    q = spark.createDataFrame([("q", "alpha")], "query_id STRING, query_text STRING")
    got = _hits(retrieval.bm25_topk(docs, "doc_id", "text", q, k=5))
    assert [(r, d) for _, r, d, _ in got] == [(1, "a"), (2, "b")]
    assert got[0][3] == got[1][3]


def test_k_validation(spark, corpus):
    q = spark.createDataFrame([("q", "x")], "query_id STRING, query_text STRING")
    with pytest.raises(ValueError):
        retrieval.bm25_topk(corpus, "doc_id", "text", q, k=0)
