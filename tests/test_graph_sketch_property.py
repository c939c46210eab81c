"""Property tests (Hypothesis) for the graph/sketch wave, against
pure-Python references computed per example:

  - containment >= jaccard on every mined pair (min(|A|,|B|) <= |A∪B|),
    and both match the exact set arithmetic of a Python replay;
  - count-min estimates >= exact counts for EVERY token of EVERY random
    corpus (the one-sided CMS guarantee), with per-row mass equal to the
    token-stream length;
  - integer PageRank on random fixed-out-degree graphs: teleport floor,
    at-most-initial total mass, determinism — replayed exactly by a
    Python integer power iteration.
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators import dedup, graph, sketch  # noqa: E402

# small word pool so random docs actually share shingles
words = st.sampled_from([f"w{i}" for i in range(8)])
doc_text = st.lists(words, min_size=1, max_size=12).map(" ".join)
corpus = st.lists(doc_text, min_size=1, max_size=6)


def _shingles(text: str, k: int = 3) -> set:
    toks = text.split(" ")
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i:i + k]) for i in range(n)}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=corpus)
def test_containment_vs_jaccard_and_python_replay(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    # max_df high enough that no stop-shingle pruning interferes
    cont = {
        (r.id_a, r.id_b): (r.containment, r.n_a, r.n_b)
        for r in dedup.ngram_containment_pairs(
            docs, "doc_id", "text", min_containment=0.0, max_df=1000
        ).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    for (a, b), (c, n_a, n_b) in cont.items():
        inter = len(sh[a] & sh[b])
        assert n_a == len(sh[a]) and n_b == len(sh[b])
        expected = inter / min(len(sh[a]), len(sh[b]))
        assert abs(c - expected) < 1e-9
        jac = inter / len(sh[a] | sh[b])
        assert c >= jac - 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=corpus, width=st.sampled_from([4, 16, 256]))
def test_cms_one_sided_error_on_random_corpora(spark, texts, width):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    sk = sketch.count_min_build(docs, "text", depth=3, width=width)
    exact = Counter(tok for t in texts for tok in t.split(" "))
    probes = spark.createDataFrame([(t,) for t in exact], "tok STRING")
    est = {
        r.tok: r.est_count
        for r in sketch.count_min_estimate(
            sk, probes, "tok", depth=3, width=width
        ).collect()
    }
    assert set(est) == set(exact)
    for tok, c in exact.items():
        assert est[tok] >= c, f"undercount for {tok!r}"
    # per-row mass conservation
    total = sum(exact.values())
    per_row = Counter()
    for r in sk.collect():
        per_row[r.row] += r.c
    assert all(v == total for v in per_row.values())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=2, max_value=12),
    dsts=st.data(),
    iters=st.integers(min_value=1, max_value=3),
)
def test_pagerank_matches_python_integer_power_iteration(spark, n, dsts, iters):
    out_degree = 2
    edge_rows = []
    for src in range(n):
        for _ in range(out_degree):
            edge_rows.append(
                (src, dsts.draw(st.integers(min_value=0, max_value=n - 1)))
            )
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(edge_rows, "src LONG, dst LONG")
    got = {
        r.node: r.rank_micro
        for r in graph.pagerank_micro(
            docs, "doc_id", out_degree=out_degree, iterations=iters, edges=edges
        ).collect()
    }
    # python replay with identical integer arithmetic
    ranks = {v: 10**6 for v in range(n)}
    for _ in range(iters):
        sums = {v: 0 for v in range(n)}
        for src, dst in edge_rows:
            sums[dst] += ranks[src] // out_degree
        ranks = {v: 150_000 + (85 * sums[v]) // 100 for v in range(n)}
    assert got == ranks
    assert all(v >= 150_000 for v in got.values())
    assert sum(got.values()) <= n * 10**6


# ---------------------------------------------------------------------------
# wave 4: HLL registers and crawl scheduling

hll_item = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=st.lists(hll_item, min_size=1, max_size=40), m=st.sampled_from([16, 64, 256]))
def test_hll_registers_equal_python_replay_on_random_items(spark, items, m):
    import hashlib

    df = spark.createDataFrame([(x,) for x in items], "item STRING")
    got = {r.bucket: r.r for r in sketch.hll_build(df, "item", m=m).collect()}
    want = {}
    for it in set(items):
        h = hashlib.md5((it + ":hll").encode()).hexdigest()
        b = int(h[:12], 16) % m
        tail = int(h[12:24], 16)
        rho = 49 if tail == 0 else 48 - tail.bit_length() + 1
        want[b] = max(want.get(b, 0), rho)
    assert got == want
    # estimate is a pure function of the registers: deterministic
    e1 = sketch.hll_estimate(sketch.hll_build(df, "item", m=m), m=m).collect()
    e2 = sketch.hll_estimate(sketch.hll_build(df, "item", m=m), m=m).collect()
    assert [tuple(r) for r in e1] == [tuple(r) for r in e2]


prio_or_null = st.one_of(st.none(), st.integers(min_value=0, max_value=4).map(float))
host_or_null = st.one_of(st.none(), st.sampled_from(["h0", "h1"]))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(st.tuples(host_or_null, prio_or_null), min_size=1, max_size=16),
    budget=st.integers(min_value=1, max_value=4),
)
def test_crawl_schedule_equals_python_row_number(spark, rows, budget):
    """For ANY frontier (including NULL hosts/priorities and heavy tie
    classes) the decomposed rank equals a NULLS-LAST row_number replay,
    and the per-(host, slot) budget holds."""
    from csv_cruncher_spark.operators import crawl

    frontier = [(i, h, p) for i, (h, p) in enumerate(rows)]
    df = spark.createDataFrame(frontier, "url_id LONG, host STRING, prio DOUBLE")
    got = {
        r.url_id: (r.rank_in_host, r.slot)
        for r in crawl.crawl_schedule(df, "host", "prio", "url_id", budget).collect()
    }
    # python replay: group by host, order by (prio desc nulls last, id)
    by_host: dict = {}
    for i, h, p in frontier:
        by_host.setdefault(h, []).append((i, p))
    want = {}
    for h, members in by_host.items():
        members.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
        for rank, (i, _) in enumerate(members, start=1):
            want[i] = (rank, (rank - 1) // budget)
    assert got == want
