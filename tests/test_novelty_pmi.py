"""novelty_scores (operators/dedup.py) and pmi_collocations
(operators/textstats.py): hand-computable fixtures. Cross-engine
bit-exactness of both is covered by the `doc_novelty_scores` /
`pmi_collocations_top` oracle entries (tests/test_oracle_parity.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.operators import dedup, textstats  # noqa: E402


def test_novelty_first_owner_and_saturation(spark):
    # doc 0 introduces everything; doc 1 repeats doc 0 plus one new
    # trigram; doc 2 is a verbatim copy of doc 0 (novelty exactly 0).
    a = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [(0, a), (1, a + " w6"), (2, a)], "doc_id LONG, text STRING"
    )
    got = {
        r.id: (r.n_shingles, r.n_novel, r.novelty)
        for r in dedup.novelty_scores(docs, "doc_id", "text").collect()
    }
    # 5 tokens -> 3 distinct trigrams; doc 1 has 4 (one new: "w4 w5 w6")
    assert got[0] == (3, 3, 1.0)
    assert got[1][0] == 4 and got[1][1] == 1 and abs(got[1][2] - 0.25) < 1e-12
    assert got[2] == (3, 0, 0.0)


def test_novelty_keeps_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, None)], "doc_id LONG, text STRING"
    )
    got = {r.id: r for r in dedup.novelty_scores(docs, "doc_id", "text").collect()}
    assert set(got) == {0, 1}
    assert got[1].n_shingles == 0 and got[1].n_novel == 0
    assert got[1].novelty is None


def test_pmi_prefers_exclusive_pairs(spark):
    # "x y" always co-occur and appear nowhere else; "a b" co-occur as
    # often but both words also appear alone everywhere, diluting PMI.
    rows = [(i, "x y a b a c b c") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = textstats.pmi_collocations(docs, "text", min_count=5, top_k=10).collect()
    assert out, "expected collocations above the floor"
    top = out[0]
    assert (top.w1, top.w2) == ("x", "y")
    ranks = {(r.w1, r.w2): r.pmi_micro for r in out}
    assert ranks[("x", "y")] > ranks[("a", "b")]
    # every pair respects the count floor
    assert all(r.n_pair >= 5 for r in out)


def test_pmi_single_token_and_null_docs_are_safe(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, None), (2, "p q"), (3, "p q"), (4, "p q"),
         (5, "p q"), (6, "p q")],
        "doc_id LONG, text STRING",
    )
    out = textstats.pmi_collocations(docs, "text", min_count=5, top_k=10).collect()
    assert [(r.w1, r.w2, r.n_pair) for r in out] == [("p", "q", 5)]


def test_pmi_deterministic_topk_ordering(spark):
    rows = [(i, "m n m n o p o p") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    a = textstats.pmi_collocations(docs, "text", min_count=5, top_k=3).collect()
    b = textstats.pmi_collocations(docs, "text", min_count=5, top_k=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) <= 3
