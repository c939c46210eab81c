"""SemDeDup (operators/semdedup.py), C4 cleanup (operators/c4.py) and
ANN recall evaluation (operators/recall.py): semantics against tiny
hand-checkable frames, the cross-cluster blindness contract, parameter
validation, and the zero-shuffle / no-cartesian plan contracts."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import c4, recall, semdedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id int, embedding array<double>",
    )


# two tight clusters around (1,0) and (0,1); ids chosen so the seeds
# (lowest 2 ids) are one per cluster
CLUSTERED = [
    (0, (1.0, 0.0)),
    (1, (0.0, 1.0)),
    (2, (0.999, 0.001)),   # near-dup of 0
    (3, (0.001, 0.999)),   # near-dup of 1
    (4, (0.7, 0.7)),       # equidistant tie -> first-minimum rule -> cid 0;
                           # cosine to its cluster-mates ~0.71, never pairs
]


def test_pairs_within_cluster_only(spark):
    df = _emb(spark, CLUSTERED)
    pairs = semdedup.semantic_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.999, n_clusters=2
    ).collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    assert got == {(0, 2), (1, 3)}
    # every pair carries its cluster and a cosine >= threshold
    assert all(r["cosine"] >= 0.999 for r in pairs)


def test_survivors_drop_higher_id(spark):
    df = _emb(spark, CLUSTERED)
    out = semdedup.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.999, n_clusters=2
    )
    assert {r["vec_id"] for r in out.collect()} == {0, 1, 4}
    # original columns untouched
    assert out.columns == df.columns


def test_cross_cluster_pairs_are_invisible(spark):
    # near-identical vectors (cosine ~ 1) forced into DIFFERENT clusters
    # by explicit centroids -> SemDeDup must NOT pair them (the
    # documented partition-blindness contract); the same vectors under
    # one shared centroid DO pair
    df = _emb(spark, [(0, (1.0, 0.0)), (1, (0.999999, 0.0))])
    split_cents = [[1_000_000.0, 0.0], [999_999.0, 0.0]]
    assert (
        semdedup.semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=0.5, centroids=split_cents
        ).count()
        == 0
    )
    one_cent = [[1_000_000.0, 0.0]]
    pairs = semdedup.semantic_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.5, centroids=one_cent
    ).collect()
    assert [(p["a_id"], p["b_id"], p["cid"]) for p in pairs] == [(0, 1, 0)]


def test_zero_norm_never_pairs(spark):
    df = _emb(spark, [(0, (0.0, 0.0)), (1, (0.0, 0.0)), (2, (1.0, 0.0))])
    pairs = semdedup.semantic_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.0, n_clusters=1
    ).collect()
    assert all(0 not in (r["a_id"], r["b_id"]) and 1 not in (r["a_id"], r["b_id"])
               for r in pairs)


def test_seed_centroids_requires_enough_vectors(spark):
    df = _emb(spark, [(0, (1.0, 0.0))])
    with pytest.raises(ValueError, match="at least 2 vectors"):
        semdedup.seed_centroids(df, "vec_id", "embedding", 2)


def test_pair_join_is_not_cartesian(spark):
    df = _emb(spark, CLUSTERED)
    plan = semdedup.semantic_dedup_pairs(
        df, "vec_id", "embedding", n_clusters=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------- c4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "this line has five words.",      # kept
            "too short.",                     # < 5 words
            "no terminal punctuation here at all",  # no punct
            "please enable JavaScript and reload the page.",  # banner
            'he said "five words are enough."',  # kept (quote end)
        ]
    )
    out = c4.c4_clean(
        _docs(spark, [(1, text)]), "doc_id", "text", min_words=5, min_kept_lines=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_kept_lines"] == 2 and r["n_dropped_lines"] == 3
    assert r["text"].splitlines() == [
        "this line has five words.",
        'he said "five words are enough."',
    ]


def test_c4_document_rules(spark):
    good = "one good line with five words.\nanother good line with words."
    rows = [
        (1, good),
        (2, good + "\nlorem ipsum dolor sit amet."),
        (3, good + "\nif (x) { return; }"),
        (4, "only one good line with five words."),  # < min_kept_lines
        (5, None),                                    # NULL text dropped
    ]
    out = c4.c4_clean(
        _docs(spark, rows), "doc_id", "text", min_words=5, min_kept_lines=2
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_c4_param_validation(spark):
    df = _docs(spark, [(1, "x.")])
    with pytest.raises(ValueError, match="min_words"):
        c4.c4_clean(df, "doc_id", "text", min_words=0)
    with pytest.raises(ValueError, match="min_kept_lines"):
        c4.c4_clean(df, "doc_id", "text", min_kept_lines=0)


def test_c4_is_a_pure_projection(spark):
    df = _docs(spark, [(1, "a line of five words here.")])
    plan = (
        c4.c4_clean(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------- recall


def _qset(spark):
    # ids 0 and 1 are the two seed centroids (lowest ids) — one per
    # direction, so the 2-cluster partition is {0, 2, 3} / {1, 4, 5}
    rows = [
        (0, (1.0, 0.0)),
        (1, (0.0, 1.0)),
        (2, (0.9, 0.1)),
        (3, (0.8, 0.2)),
        (4, (0.1, 0.9)),
        (5, (0.2, 0.8)),
    ]
    corpus = _emb(spark, rows)
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "qid int, qvec array<double>",
    )
    return corpus, queries


def test_full_probe_recall_is_one(spark):
    corpus, queries = _qset(spark)
    truth = recall.exact_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", k=3
    )
    approx = recall.ivf_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec",
        k=3, n_clusters=2, n_probe=2,
    )
    out = recall.ann_recall(truth, approx).collect()
    assert sorted((r["query_id"], r["recall"]) for r in out) == [
        (100, 1.0), (200, 1.0),
    ]
    assert all(r["n_truth"] == 3 and r["n_hits"] == 3 for r in out)


def test_partial_probe_recall_counts_misses(spark):
    corpus, queries = _qset(spark)
    truth = recall.exact_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", k=4
    )
    approx = recall.ivf_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec",
        k=4, n_clusters=2, n_probe=1,
    )
    out = {r["query_id"]: r for r in recall.ann_recall(truth, approx).collect()}
    # each query's 4th-nearest true neighbour lives in the UNPROBED
    # cluster (cos ~0.24 across the axis), so one miss each
    assert out[100]["n_hits"] == 3 and out[100]["recall"] == 0.75
    assert out[200]["n_hits"] == 3 and out[200]["recall"] == 0.75


def test_exact_topk_ranking_and_ties(spark):
    corpus, queries = _qset(spark)
    truth = recall.exact_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", k=2
    ).collect()
    by_q = {}
    for r in truth:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert sorted(by_q[100]) == [(1, 0), (2, 2)]
    assert sorted(by_q[200]) == [(1, 1), (2, 4)]


def test_n_probe_validation(spark):
    corpus, queries = _qset(spark)
    with pytest.raises(ValueError, match="n_probe"):
        recall.ivf_topk_multi(
            corpus, "vec_id", "embedding", queries, "qid", "qvec",
            n_clusters=2, n_probe=3,
        )


def test_truth_side_broadcasts_queries(spark):
    corpus, queries = _qset(spark)
    plan = recall.exact_topk_multi(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", k=2
    )._jdf.queryExecution().executedPlan().toString()
    # the cross join must be the broadcast nested-loop with the QUERY
    # side broadcast — the corpus never shuffles for the ground truth
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
