"""Link-graph analytics (operators/graph.py) + containment pairs
(operators/dedup.py ngram_containment_pairs).

PageRank is verified three ways: an exact hand-computable cycle (ranks
are a fixed point), structural invariants (teleport floor, bounded mass
loss from integer division, determinism), and a hub test (the node every
other node links to out-ranks the rest). The DuckDB bit-exactness of the
default pseudo-graph path is covered by the `crawl_frontier_rank` oracle
entry (tests/test_oracle_parity.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators import dedup, graph  # noqa: E402


def _docs(spark, n=40):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_link_graph_shape_and_determinism(spark):
    docs = _docs(spark)
    e1 = graph.derive_link_graph(docs, "doc_id", out_degree=3)
    rows = e1.collect()
    assert len(rows) == 40 * 3
    assert all(0 <= r.dst < 40 for r in rows)
    e2 = graph.derive_link_graph(docs, "doc_id", out_degree=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, e2.collect()))


def test_pagerank_cycle_is_exact_fixed_point(spark):
    # 0 -> 1 -> 2 -> 0 with out_degree 1: contribution = rank div 1,
    # new rank = 150000 + 85% of 1_000_000 = exactly 1_000_000 again.
    docs = _docs(spark, 3)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src LONG, dst LONG"
    )
    out = graph.pagerank_micro(
        docs, "doc_id", out_degree=1, iterations=4, edges=edges
    ).collect()
    assert {r.node: r.rank_micro for r in out} == {0: 10**6, 1: 10**6, 2: 10**6}


def test_pagerank_invariants_and_hub(spark):
    n = 40
    docs = _docs(spark, n)
    # every node links to the hub (node 0) and to its two neighbours
    rows = []
    for i in range(n):
        rows += [(i, 0), (i, (i + 1) % n), (i, (i + 2) % n)]
    edges = spark.createDataFrame(rows, "src LONG, dst LONG")
    ranks = graph.pagerank_micro(
        docs, "doc_id", out_degree=3, iterations=3, edges=edges
    )
    got = {r.node: r.rank_micro for r in ranks.collect()}
    # teleport floor: nobody below the base
    assert all(v >= 150_000 for v in got.values())
    # integer division only ever LOSES micro-mass: total <= N * 1e6, and
    # the loss is bounded (< out_degree micro per edge-div + 1 per node
    # per iteration — generous envelope 10 micro * N * iterations)
    total = sum(got.values())
    assert total <= n * 10**6
    assert total >= n * 10**6 - 10 * n * 3
    # the hub out-ranks everyone else
    hub = got.pop(0)
    assert hub > max(got.values())
    # deterministic across runs
    again = {
        r.node: r.rank_micro
        for r in graph.pagerank_micro(
            docs, "doc_id", out_degree=3, iterations=3, edges=edges
        ).collect()
    }
    again.pop(0)
    assert again == got


def test_pagerank_plan_has_no_nested_loop(spark):
    docs = _docs(spark, 20)
    ranks = graph.pagerank_micro(docs, "doc_id", iterations=2)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_containment_detects_strict_inclusion(spark):
    # B contains A verbatim plus a long unique tail: containment 1.0
    # while Jaccard is well below the same threshold.
    a = "alpha beta gamma delta epsilon zeta"
    b = a + " " + " ".join(f"tail{i}" for i in range(18))
    c = "totally different words nothing shared here at all"
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id LONG, text STRING"
    )
    pairs = dedup.ngram_containment_pairs(
        docs, "doc_id", "text", min_containment=0.9
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b) == (0, 1)
    assert p.containment == 1.0
    # sizes identify the contained (smaller) side
    assert p.n_a < p.n_b
    # the symmetric Jaccard on the same pair is diluted by the tail
    j = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.0
    ).collect()
    jmap = {(r.id_a, r.id_b): r.jaccard for r in j}
    assert jmap[(0, 1)] < 0.9


def test_containment_threshold_filters(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b c x y z w v")],
        "doc_id LONG, text STRING",
    )
    # 8 tokens -> 6 distinct 3-shingles each; exactly one shared ("a b c")
    low = dedup.ngram_containment_pairs(
        docs, "doc_id", "text", min_containment=0.1
    ).collect()
    assert len(low) == 1 and abs(low[0].containment - 1 / 6) < 1e-9
    high = dedup.ngram_containment_pairs(
        docs, "doc_id", "text", min_containment=0.5
    ).collect()
    assert high == []


def test_personalized_pagerank_exact_cycle(spark):
    # cycle 0 -> 1 -> 2 -> 0, out_degree 1, seeds = {0}:
    #   r0 = [1e6, 0, 0]
    #   r1 = [150000, 850000, 0]
    #   r2 = [150000, 127500, 722500]
    docs = _docs(spark, 3)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src LONG, dst LONG")
    seeds = spark.createDataFrame([(0,)], "doc_id LONG")
    out = {
        r.node: r.rank_micro
        for r in graph.pagerank_micro(
            docs, "doc_id", out_degree=1, iterations=2, edges=edges, seeds=seeds
        ).collect()
    }
    assert out == {0: 150_000, 1: 127_500, 2: 722_500}


def test_personalized_mass_concentrates_near_seeds(spark):
    # star: every node links to the hub; seed = one leaf. Only the hub
    # (the leaf's target) and the seed itself can hold mass; unrelated
    # leaves must be exactly 0.
    n = 20
    docs = _docs(spark, n)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(n)], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(5,)], "doc_id LONG")
    got = {
        r.node: r.rank_micro
        for r in graph.pagerank_micro(
            docs, "doc_id", out_degree=1, iterations=3, edges=edges, seeds=seeds
        ).collect()
    }
    assert got[5] > 0 and got[0] > 0
    assert all(v == 0 for k, v in got.items() if k not in (0, 5))


# ----------------------------------------------------------------- HITS --


def _hits_replay(n, edges, iterations):
    """Pure-Python replay of hits_micro's integer arithmetic: sum
    propagation + ceil-scaled-max normalization, all // (non-negative,
    so Python floor == Spark div)."""
    def half(scores, to_auth):
        raw = {i: 0 for i in range(n)}
        for s, d in edges:
            if to_auth:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        m = max(raw.values())
        sc = max(1, (m + 999_999) // 1_000_000)
        return {i: raw[i] // sc for i in range(n)}

    h = {i: 1_000_000 for i in range(n)}
    a = None
    for _ in range(iterations):
        a = half(h, to_auth=True)
        h = half(a, to_auth=False)
    return h, a


def test_hits_matches_pure_python_replay(spark):
    import random

    rng = random.Random(73)
    n = 30
    edge_list = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    docs = _docs(spark, n)
    edges = spark.createDataFrame(edge_list, "src LONG, dst LONG")
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in graph.hits_micro(docs, "doc_id", iterations=2, edges=edges).collect()
    }
    want_h, want_a = _hits_replay(n, edge_list, 2)
    assert got == {i: (want_h[i], want_a[i]) for i in range(n)}


def test_hits_hub_and_authority_separate(spark):
    """Directory page 0 links to content pages 1..5 which nobody else
    links to; pages 6..9 all link to content page 1. Page 0 must be the
    top hub with ~zero authority; page 1 the top authority."""
    docs = _docs(spark, 10)
    edge_list = [(0, i) for i in range(1, 6)] + [(i, 1) for i in range(6, 10)]
    edges = spark.createDataFrame(edge_list, "src LONG, dst LONG")
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in graph.hits_micro(docs, "doc_id", iterations=3, edges=edges).collect()
    }
    top_hub = max(got, key=lambda k: got[k][0])
    top_auth = max(got, key=lambda k: got[k][1])
    assert top_hub == 0 and top_auth == 1
    assert got[0][1] == 0  # nobody links TO the directory page
    # scores stay in [0, 10^6] after every normalization
    assert all(0 <= h <= 1_000_000 and 0 <= a <= 1_000_000 for h, a in got.values())


def test_hits_no_scale_fatal_plan_and_release(spark):
    docs = _docs(spark, 25)
    out = graph.hits_micro(docs, "doc_id", iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    out.count()
    dedup.release(out)  # every pinned intermediate gets unpersisted


def test_hits_rejects_zero_iterations(spark):
    import pytest

    with pytest.raises(ValueError, match="iterations"):
        graph.hits_micro(_docs(spark, 5), "doc_id", iterations=0)


def test_bfs_depth_hand_computed_chain(spark):
    # explicit edges: 0->1->2->3->4 chain plus a shortcut 0->3; seed {0}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], ["src", "dst"]
    )
    docs = _docs(spark, 6)
    seeds = spark.createDataFrame([(0,)], ["seed"])
    got = {
        r.node: r.depth
        for r in graph.bfs_depth(
            docs, "doc_id", edges=edges, seeds=seeds, max_rounds=3
        ).collect()
    }
    # shortcut wins: 3 is at depth 1, not 3; 4 at depth 2; 5 unreachable
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: None}


def test_bfs_depth_horizon_and_seed_distinct(spark):
    # 0->1->2->3 with max_rounds=2: node 3 beyond horizon -> NULL;
    # duplicated seed rows collapse (depth stays 0, no double-count)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    docs = _docs(spark, 4)
    seeds = spark.createDataFrame([(0,), (0,)], ["seed"])
    got = {
        r.node: r.depth
        for r in graph.bfs_depth(
            docs, "doc_id", edges=edges, seeds=seeds, max_rounds=2
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: None}


def test_bfs_depth_cycle_terminates_at_first_visit(spark):
    # 2-cycle 0<->1: revisits are anti-joined away, depths stay minimal
    edges = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    docs = _docs(spark, 2)
    seeds = spark.createDataFrame([(0,)], ["seed"])
    got = {
        r.node: r.depth
        for r in graph.bfs_depth(
            docs, "doc_id", edges=edges, seeds=seeds, max_rounds=3
        ).collect()
    }
    assert got == {0: 0, 1: 1}


def test_bfs_depth_requires_seeds_and_plan_is_join_only(spark):
    docs = _docs(spark, 10)
    try:
        graph.bfs_depth(docs, "doc_id")
        raise AssertionError("expected ValueError without seeds")
    except ValueError:
        pass
    seeds = spark.createDataFrame([(0,)], ["seed"])
    out = graph.bfs_depth(docs, "doc_id", seeds=seeds, max_rounds=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    dedup.release(out)


def test_pagerank_weighted_hand_computed(spark):
    # a->b w3, a->c w1, b->c w1; out_w(a)=4, out_w(b)=1; c dangling
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 1)], ["src", "dst", "w"]
    )
    got = {
        r.node: r.rank_micro
        for r in graph.pagerank_weighted(
            edges, weight_col="w", iterations=2
        ).collect()
    }
    # iter1: b = 150000 + 85*((1e6*3)//4)//100 = 787500
    #        c = 150000 + 85*((1e6*1)//4 + (1e6*1)//1)//100 = 1212500
    # iter2: b = 150000 + 85*((150000*3)//4)//100 = 245625
    #        c = 150000 + 85*((150000*1)//4 + 787500)//100 = 851250
    assert got == {"a": 150000, "b": 245625, "c": 851250}


def test_pagerank_weighted_unit_weights_match_fixed_degree_kernel(spark):
    # on a fixed out-degree graph, weight-1 variable-degree PageRank must
    # equal pagerank_micro exactly (parallel edges included: both kernels
    # see one row per slot)
    docs = _docs(spark, 30)
    e = graph.derive_link_graph(docs, "doc_id", out_degree=3)
    a = {
        r.node: r.rank_micro
        for r in graph.pagerank_micro(docs, "doc_id", edges=e).collect()
    }
    b = {
        r.node: r.rank_micro
        for r in graph.pagerank_weighted(
            e, nodes=docs.select(F.col("doc_id").cast("long")), iterations=3
        ).collect()
    }
    assert a == b


def test_pagerank_weighted_isolated_and_string_keys(spark):
    edges = spark.createDataFrame([("x.com", "y.com", 5)], ["src", "dst", "w"])
    nodes = spark.createDataFrame(
        [("x.com",), ("y.com",), ("lonely.org",)], ["host"]
    )
    got = {
        r.node: r.rank_micro
        for r in graph.pagerank_weighted(
            edges, weight_col="w", iterations=3, nodes=nodes
        ).collect()
    }
    # isolated node holds the teleport base; sole target decays toward it
    assert got["lonely.org"] == 150000
    assert got["x.com"] == 150000
    assert got["y.com"] > 150000
    plan = (
        graph.pagerank_weighted(edges, weight_col="w", iterations=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_pagerank_weighted_drops_nonpositive_weights(spark):
    # zero/NULL-weight edges carry no mass AND don't poison out_w:
    # a->b w0 is dropped, so a's whole unit of rank flows to c via w2
    edges = spark.createDataFrame(
        [("a", "b", 0), ("a", "c", 2), ("z", "b", None)],
        "src string, dst string, w int",
    )
    got = {
        r.node: r.rank_micro
        for r in graph.pagerank_weighted(
            edges, weight_col="w", iterations=1
        ).collect()
    }
    # b gets only teleport base; c gets a's full contribution
    assert got["b"] == 150000
    assert got["c"] == 150000 + (85 * 1_000_000) // 100
