"""Percentile-threshold selection (operators/ranking.py): exact
semantics against a pure-Python percentile, tie handling, global vs
per-stratum thresholds, and the no-sort plan contract."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import ranking


def _scored(spark):
    # lang a: scores 1..10 (p50 threshold = 5.5 -> keep 6..10)
    # lang b: scores all 7 (ties: everything >= threshold survives)
    rows = [(i, "a", i) for i in range(1, 11)] + [(100 + i, "b", 7) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id int, lang string, score int")


def test_per_stratum_threshold_and_ties(spark):
    out = ranking.percentile_filter(
        _scored(spark), "score", keep_fraction=0.5, stratum_col="lang"
    )
    got = {(r["lang"], r["doc_id"]) for r in out.collect()}
    assert {d for (s, d) in got if s == "a"} == {6, 7, 8, 9, 10}
    # all of b ties at its own median -> all kept
    assert len([1 for (s, _) in got if s == "b"]) == 4


def test_global_threshold(spark):
    out = ranking.percentile_filter(_scored(spark), "score", keep_fraction=0.5)
    # global median of [1..10, 7,7,7,7] = 7 -> keep scores >= 7
    assert sorted(r["score"] for r in out.collect()) == [7] * 5 + [8, 9, 10]


def test_keep_all_and_validation(spark):
    df = _scored(spark)
    assert ranking.percentile_filter(df, "score", 1.0).count() == df.count()
    with pytest.raises(ValueError):
        ranking.percentile_filter(df, "score", 0.0)
    with pytest.raises(ValueError):
        ranking.percentile_filter(df, "score", 1.5)


def test_threshold_out_column(spark):
    out = ranking.percentile_filter(
        _scored(spark), "score", 0.5, stratum_col="lang", threshold_out="thr"
    )
    thr = {r["lang"]: r["thr"] for r in out.select("lang", "thr").distinct().collect()}
    assert thr == {"a": 5.5, "b": 7.0}


def test_plan_has_no_sort_and_broadcasts_thresholds(spark):
    out = ranking.percentile_filter(
        _scored(spark), "score", 0.5, stratum_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan and "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_score_expression_column(spark):
    df = _scored(spark).withColumn("text", F.concat(F.lit("x "), F.col("score")))
    out = ranking.percentile_filter(
        df, F.col("score") * 2, keep_fraction=0.3, stratum_col="lang"
    )
    assert {r["doc_id"] for r in out.filter("lang = 'a'").collect()} == {8, 9, 10}


def test_cap_per_group_hash_order(spark):
    import hashlib

    rows = [(i, "s1" if i < 20 else "s2") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, src string")
    out = ranking.cap_per_group(df, "src", k=5, id_col="doc_id")
    got = {r["src"]: sorted(x["doc_id"] for x in out.filter(F.col("src") == r["src"]).collect())
           for r in out.select("src").distinct().collect()}
    # pure-Python twin of the deterministic draw
    def draw(i):
        return hashlib.md5(f"{i}:cap-v1".encode()).hexdigest()[:8]
    exp1 = sorted(sorted(range(20), key=lambda i: (draw(i), i))[:5])
    exp2 = sorted(sorted(range(20, 30), key=lambda i: (draw(i), i))[:5])
    assert got == {"s1": exp1, "s2": exp2}
    assert out.count() == 10


def test_cap_per_group_explicit_order_and_small_groups(spark):
    import pytest

    rows = [(1, "a", 9.0), (2, "a", 1.0), (3, "a", 5.0), (4, "b", 2.0)]
    df = spark.createDataFrame(rows, "doc_id int, src string, score double")
    # keep the 2 LOWEST scores per group (explicit ascending order)
    out = ranking.cap_per_group(df, "src", k=2, id_col="doc_id", order=F.col("score"))
    assert {r["doc_id"] for r in out.collect()} == {2, 3, 4}
    # groups under the cap pass through whole
    assert out.filter("src = 'b'").count() == 1
    with pytest.raises(ValueError):
        ranking.cap_per_group(df, "src", k=0, id_col="doc_id")


def test_cap_per_group_window_is_payload_free(spark):
    """Round-4 verdict: the cap's row_number window must run over a
    PROJECTED (group, order, id) frame — the document payload must never
    ride the skewed-group exchange — with survivors semi-joined back.
    Bonus pinned here: Spark plants a map-side WindowGroupLimit (Partial)
    before the group exchange, so a hot domain ships at most k rows per
    input partition."""
    rows = [(i, "s1" if i < 20 else "s2", "payload text " * 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, src string, text string")
    out = ranking.cap_per_group(df, "src", k=5, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    # every operator of the narrow window subtree (the lines naming the
    # projected __g key) is payload-free
    g_lines = [l for l in plan.splitlines() if "__g#" in l]
    assert g_lines and all("text#" not in l for l in g_lines), plan
    # the projection feeding the window carries exactly (group, id, order)
    proj = next(l for l in g_lines if "AS __g#" in l)
    assert "AS __id#" in proj and "AS __ord#" in proj and "text" not in proj
    # map-side partial group-limit before the exchange
    assert plan.count("WindowGroupLimit") >= 2 and "Partial" in plan, plan
    # semantics unchanged by the payload-free rewrite
    assert out.count() == 10 and set(out.columns) == {"doc_id", "src", "text"}


def test_cap_per_group_null_id_documented_drop(spark):
    """The semi-join-back key is null-unsafe: NULL-id rows are dropped
    (documented contract — filter or synthesize ids first)."""
    rows = [(1, "a"), (2, "a"), (None, "a"), (4, "b")]
    df = spark.createDataFrame(rows, "doc_id int, src string")
    out = ranking.cap_per_group(df, "src", k=10, id_col="doc_id")
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4}


def test_percentile_filter_approx_fraction_bound(spark):
    """approx=True (percentile_approx sketch, bounded state) must keep a
    fraction within ~1/accuracy of the exact path's — property over
    several fractions on a 5k-row continuous-score frame."""
    import random

    rng = random.Random(7)
    rows = [(i, "a" if i % 3 else "b", rng.random()) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, score double").cache()
    n_by = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    try:
        for q in (0.25, 0.5, 0.9):
            out = ranking.percentile_filter(
                df, "score", q, stratum_col="lang", approx=True, accuracy=10_000
            )
            got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
            for lang, n in n_by.items():
                realized = got.get(lang, 0) / n
                # rank error 1/accuracy plus the >= tie inclusion; allow a
                # small slack on top for the discrete 5k sample
                assert abs(realized - q) <= 1 / 10_000 + 2 / n, (lang, q, realized)
    finally:
        df.unpersist()


def test_percentile_filter_null_stratum_kept(spark):
    """NULL strata form their own group: top-scoring NULL-stratum rows
    must survive, not vanish in the threshold equi-join."""
    rows = [(1, None, 10), (2, None, 1), (3, "a", 5), (4, "a", 6)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, score int")
    out = ranking.percentile_filter(df, "score", 0.5, stratum_col="lang")
    got = {r["doc_id"] for r in out.collect()}
    assert 1 in got and 4 in got and 2 not in got


def test_token_budget_filter_greedy_prefix(spark):
    """Per-group greedy prefix under an explicit order: cumulative cost
    including the row must stay <= budget; the first over-budget row and
    everything ranked after it are out (positive costs => kept set is a
    prefix of the ranking)."""
    rows = [
        (1, "a", 300), (2, "a", 300), (3, "a", 300), (4, "a", 50),
        (5, "b", 900), (6, "b", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id int, src string, cost int")
    out = ranking.token_budget_filter(
        df, budget=650, cost_col="cost", id_col="doc_id",
        group_col="src", order=F.col("doc_id"), cum_out="cum",
    )
    got = {r["doc_id"]: r["cum"] for r in out.collect()}
    # group a: 300, 600, (900 > 650 stops), doc 4 ranked after the trip
    # point is NOT rescued (greedy prefix, not knapsack)
    # group b: doc 5 alone blows the budget -> b contributes nothing
    # (its first cum is 900) and doc 6 after it stays out too
    assert got == {1: 300, 2: 600}


def test_token_budget_filter_default_draw_and_global(spark):
    """Default order = the deterministic md5 draw; group_col=None applies
    one global budget. Re-derive the draw independently and replay."""
    import hashlib

    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, cost int")
    out = ranking.token_budget_filter(df, budget=450, cost_col="cost", id_col="doc_id")
    draw = sorted(
        range(10),
        key=lambda i: (hashlib.md5(f"{i}:budget-v1".encode()).hexdigest()[:8], i),
    )
    expect = set(draw[:4])  # 4 * 100 <= 450 < 5 * 100
    assert {r["doc_id"] for r in out.collect()} == expect
    with __import__("pytest").raises(ValueError):
        ranking.token_budget_filter(df, budget=-1, cost_col="cost", id_col="doc_id")


def test_token_budget_filter_window_is_payload_free(spark):
    """Same scale contract as cap_per_group: the running-sum window runs
    over the PROJECTED (group, id, order, cost) frame — payload columns
    never ride the skewed group exchange — and survivors join back on the
    uniform id key."""
    rows = [(i, "s1" if i < 20 else "s2", "payload text " * 50, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, src string, text string, cost int")
    out = ranking.token_budget_filter(
        df, budget=100, cost_col="cost", id_col="doc_id", group_col="src"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    g_lines = [l for l in plan.splitlines() if "__g#" in l]
    assert g_lines and all("text#" not in l for l in g_lines), plan
    proj = next(l for l in g_lines if "AS __g#" in l)
    assert "AS __id#" in proj and "AS __cost#" in proj and "text" not in proj
    # semantics: 10 rows of cost 10 fit per group
    assert out.count() == 20 and set(out.columns) == {"doc_id", "src", "text", "cost"}


def test_order_direction_flag_and_sortorder_rejected(spark):
    """descending=True ranks best-first without negating the order column
    (negation breaks on string types — the round-4 keeper-tie-break bug
    class), and a F.desc(...) SortOrder — which cannot be projected into
    the narrow frame — is rejected with a pointer to the flag instead of
    crashing at execution with a codegen INTERNAL_ERROR."""
    import pytest

    rows = [
        (1, "a", 5, 100), (2, "a", 9, 100), (3, "a", 7, 100), (4, "a", 1, 100),
    ]
    df = spark.createDataFrame(rows, "doc_id int, src string, q int, cost int")
    # quality-greedy budget: top-q docs first (9, 7 fit; 5 trips at 300)
    out = ranking.token_budget_filter(
        df, budget=200, cost_col="cost", id_col="doc_id",
        group_col="src", order=F.col("q"), descending=True,
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 3}
    # top-2 by quality desc via the cap
    capped = ranking.cap_per_group(
        df, "src", k=2, id_col="doc_id", order=F.col("q"), descending=True
    )
    assert {r["doc_id"] for r in capped.collect()} == {2, 3}
    with pytest.raises(ValueError, match="descending=True"):
        ranking.token_budget_filter(
            df, budget=200, cost_col="cost", id_col="doc_id", order=F.desc("q")
        )
    with pytest.raises(ValueError, match="descending=True"):
        ranking.cap_per_group(df, "src", k=2, id_col="doc_id", order=F.desc("q"))


# ---------------------------------------------------------------------------
# quantile_buckets — CCNet-style head/middle/tail banding
# ---------------------------------------------------------------------------


def test_quantile_buckets_global_quartiles(spark):
    # scores 1..8: p25 threshold = 2.75, p75 = 6.25
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 9)], "doc_id int, score int"
    )
    out = ranking.quantile_buckets(df, "score", fractions=(0.25, 0.75))
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert {d for d, b in got.items() if b == "tail"} == {1, 2}
    assert {d for d, b in got.items() if b == "middle"} == {3, 4, 5, 6}
    assert {d for d, b in got.items() if b == "head"} == {7, 8}


def test_quantile_buckets_per_stratum_and_null_stratum(spark):
    rows = [(i, "a", i) for i in range(1, 9)] + [(100 + i, None, i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, score int")
    out = ranking.quantile_buckets(
        df, "score", fractions=(0.25, 0.75), stratum_col="lang"
    )
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # NULL stratum keeps its rows and gets its OWN thresholds (1..4:
    # p25=1.75, p75=3.25)
    assert len(got) == 12
    assert got[101] == "tail" and got[102] == "middle"
    assert got[103] == "middle" and got[104] == "head"
    # stratum a unchanged by the null stratum
    assert got[1] == "tail" and got[8] == "head"


def test_quantile_buckets_approx_and_custom_labels(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "doc_id int, score int"
    )
    out = ranking.quantile_buckets(
        df,
        "score",
        fractions=(1.0 / 3.0, 2.0 / 3.0),
        labels=("low", "mid", "high"),
        approx=True,
    )
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"low", "mid", "high"}
    # approx sketch at default accuracy is exact on 100 distinct values
    assert counts["low"] in (33, 34) and counts["high"] in (33, 34)


def test_quantile_buckets_validation(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id int, score int")
    with pytest.raises(ValueError):
        ranking.quantile_buckets(df, "score", fractions=(0.5,), labels=("a",))
    with pytest.raises(ValueError):
        ranking.quantile_buckets(df, "score", fractions=(0.7, 0.3))
    with pytest.raises(ValueError):
        ranking.quantile_buckets(df, "score", fractions=(0.0, 0.5))


def test_quantile_buckets_plan_no_window_no_sort(spark):
    df = spark.createDataFrame(
        [(i, "a", i) for i in range(1, 9)], "doc_id int, lang string, score int"
    )
    out = ranking.quantile_buckets(
        df, "score", fractions=(0.25, 0.75), stratum_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan and "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


# ---------------------------------------------------------- global_rank --


def test_global_rank_matches_python_sort_across_partitions(spark):
    import random

    rng = random.Random(31)
    rows = [(f"k{i:03d}", rng.randrange(20)) for i in range(200)]
    df = spark.createDataFrame(rows, ["key", "score"]).repartition(11)
    from csv_cruncher_spark.operators.ranking import global_rank

    got = {
        r.key: r.rank
        for r in global_rank(
            df, "score", "key", descending=True, partitions=7
        ).collect()
    }
    want = {
        k: i + 1
        for i, (k, _) in enumerate(
            sorted(rows, key=lambda kv: (-kv[1], kv[0]))
        )
    }
    assert got == want


def test_global_rank_ascending_and_null_order_last(spark):
    from csv_cruncher_spark.operators.ranking import global_rank

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 1)], "key string, score int"
    )
    got = {
        r.key: r.rank
        for r in global_rank(df, "score", "key", descending=False).collect()
    }
    assert got == {"c": 1, "a": 2, "b": 3}
    got_d = {
        r.key: r.rank
        for r in global_rank(df, "score", "key", descending=True).collect()
    }
    assert got_d == {"a": 1, "c": 2, "b": 3}
