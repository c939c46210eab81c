"""Politeness crawl scheduling (operators/crawl.py): row_number
equivalence, budget invariant, determinism across parallelism, and the
payload-free / decomposed plan shape. Cross-engine bit-exactness is the
`crawl_schedule_slots` oracle entry (tests/test_oracle_parity.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from csv_cruncher_spark.operators import crawl  # noqa: E402


def _frontier(spark, n=200, n_hosts=5):
    rows = [
        (i, f"host{i % n_hosts}", float((i * 37) % 91), f"payload-{i}" * 20)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url_id LONG, host STRING, prio DOUBLE, body STRING"
    )


def test_schedule_equals_plain_row_number(spark):
    df = _frontier(spark)
    got = crawl.crawl_schedule(df, "host", "prio", "url_id", per_host_budget=7)
    w = Window.partitionBy("host").orderBy(F.col("prio").desc(), F.col("url_id"))
    want = df.withColumn("rank_in_host", F.row_number().over(w).cast("long"))
    want = want.withColumn(
        "slot", F.floor((F.col("rank_in_host") - 1) / 7).cast("long")
    )
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )


def test_budget_invariant_and_priority_order(spark):
    df = _frontier(spark)
    got = crawl.crawl_schedule(df, "host", "prio", "url_id", per_host_budget=4)
    per_slot = got.groupBy("host", "slot").agg(
        F.count(F.lit(1)).alias("n"), F.min("prio").alias("lo"),
        F.max("prio").alias("hi"),
    ).collect()
    assert all(r.n <= 4 for r in per_slot)
    # slots serve monotonically non-increasing priority per host
    by_host = {}
    for r in sorted(per_slot, key=lambda r: (r.host, r.slot)):
        if r.host in by_host:
            assert r.hi <= by_host[r.host], "later slot got higher priority"
        by_host[r.host] = r.lo


def test_ties_break_by_id_and_ranks_are_dense(spark):
    df = spark.createDataFrame(
        [(1, "h", 5.0), (2, "h", 5.0), (3, "h", 9.0), (4, "h", 5.0)],
        "url_id LONG, host STRING, prio DOUBLE",
    )
    got = {
        r.url_id: r.rank_in_host
        for r in crawl.crawl_schedule(df, "host", "prio", "url_id", 2).collect()
    }
    assert got == {3: 1, 1: 2, 2: 3, 4: 4}


def test_deterministic_across_partitioning(spark):
    df = _frontier(spark)
    a = crawl.crawl_schedule(df.repartition(1), "host", "prio", "url_id", 5)
    b = crawl.crawl_schedule(df.repartition(13), "host", "prio", "url_id", 5)
    assert sorted(map(tuple, a.select("url_id", "rank_in_host", "slot").collect())) == sorted(
        map(tuple, b.select("url_id", "rank_in_host", "slot").collect())
    )


def test_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError):
        crawl.crawl_schedule(_frontier(spark), "host", "prio", "url_id", 0)


def test_plan_windows_are_payload_free(spark):
    """Both windows must run on narrow frames: the payload column may
    appear below the final join-back, never inside a Window node's
    child projection. We assert no Window operator's subtree includes
    the body column."""
    df = _frontier(spark)
    got = crawl.crawl_schedule(df, "host", "prio", "url_id", 5)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    # every Window block in the optimized plan lists its output; body
    # must not be among any window's attributes
    for block in plan.split("Window ")[1:]:
        header = block.split("\n", 1)[0]
        assert "body" not in header, f"payload inside window: {header}"
    assert "CartesianProduct" not in plan


def test_focused_crawl_plan_composes_rank_then_schedule(spark):
    """The one-call plan must equal manually piping pagerank_micro into
    crawl_schedule, and every host's slot order must follow rank."""
    from csv_cruncher_spark.operators import graph

    docs = spark.createDataFrame(
        [(i, f"h{i % 3}") for i in range(60)], "doc_id LONG, host STRING"
    )
    seeds = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    got = crawl.focused_crawl_plan(
        docs, "doc_id", "host", seeds, iterations=2, per_host_budget=5
    )
    ranks = graph.pagerank_micro(docs, "doc_id", iterations=2, seeds=seeds)
    scored = (
        docs.join(ranks, docs["doc_id"] == ranks["node"])
        .select("doc_id", "host", "rank_micro")
    )
    want = crawl.crawl_schedule(scored, "host", "rank_micro", "doc_id", 5)
    cols = ["doc_id", "host", "rank_micro", "rank_in_host", "slot"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
    # rank monotonicity: within a host, later fetch order never has
    # strictly higher rank
    rows = sorted(got.collect(), key=lambda r: (r.host, r.rank_in_host))
    prev = {}
    for r in rows:
        if r.host in prev:
            assert r.rank_micro <= prev[r.host]
        prev[r.host] = r.rank_micro


def test_null_priority_and_host_rows_are_kept_and_rank_last(spark):
    """Review finding: NULL priority/host rows must not vanish — they
    rank like ROW_NUMBER with NULLS-LAST priority (both engines'
    default), NULL host forming its own partition."""
    df = spark.createDataFrame(
        [(1, "h", 5.0), (2, "h", None), (3, "h", 9.0), (4, None, 1.0)],
        "url_id LONG, host STRING, prio DOUBLE",
    )
    got = {
        r.url_id: (r.host, r.rank_in_host)
        for r in crawl.crawl_schedule(df, "host", "prio", "url_id", 2).collect()
    }
    assert got == {3: ("h", 1), 1: ("h", 2), 2: ("h", 3), 4: (None, 1)}


def test_per_host_budget_column_shapes_slots(spark):
    df = _frontier(spark).withColumn(
        "hb",
        F.when(F.col("host") == "host0", F.lit(2)).otherwise(F.lit(10)),
    )
    got = crawl.crawl_schedule(
        df, "host", "prio", "url_id", per_host_budget=10, budget_col="hb"
    )
    # host0 drains 2 per slot, everyone else 10 per slot
    per = (
        got.groupBy("host", "slot")
        .count()
        .groupBy("host")
        .agg(F.max("count").alias("mx"))
        .collect()
    )
    mx = {r.host: r.mx for r in per}
    assert mx["host0"] == 2
    assert all(v <= 10 for h, v in mx.items() if h != "host0")
    # rank order unchanged vs the scalar-budget schedule
    base = crawl.crawl_schedule(df, "host", "prio", "url_id", per_host_budget=10)
    assert sorted(
        map(tuple, got.select("url_id", "rank_in_host").collect())
    ) == sorted(map(tuple, base.select("url_id", "rank_in_host").collect()))


def test_budget_column_null_falls_back_to_default(spark):
    df = _frontier(spark, n=30, n_hosts=3).withColumn(
        "hb", F.when(F.col("host") == "host1", F.lit(1)).otherwise(F.lit(None))
    )
    got = crawl.crawl_schedule(
        df, "host", "prio", "url_id", per_host_budget=5, budget_col="hb"
    )
    per = {
        (r.host, r.slot): r["count"]
        for r in got.groupBy("host", "slot").count().collect()
    }
    assert all(v == 1 for (h, s), v in per.items() if h == "host1")
    assert all(v <= 5 for (h, s), v in per.items() if h != "host1")


def test_trap_aware_schedule_throttles_flagged_host(spark):
    pages = []
    for i in range(12):  # trap: 12 urls over 2 contents
        pages.append(("trap.com", f"https://trap.com/l?p={i}", f"c{i % 2}"))
    for i in range(12):  # ok: 12 urls, all distinct content
        pages.append(("ok.com", f"https://ok.com/{i}", f"page {i}"))
    pages_df = spark.createDataFrame(pages, "host string, url string, text string")
    frontier = spark.createDataFrame(
        [(i, "trap.com" if i % 2 == 0 else "ok.com", float(i % 7))
         for i in range(40)],
        "url_id long, host string, prio double",
    )
    got = crawl.trap_aware_schedule(
        frontier, "host", "prio", "url_id",
        pages_df, "host", "url", "text",
        per_host_budget=5, trap_budget=1,
    )
    budgets = {r.host: r.host_budget for r in got.select("host", "host_budget").distinct().collect()}
    assert budgets == {"trap.com": 1, "ok.com": 5}
    per = {
        (r.host, r.slot): r["count"]
        for r in got.groupBy("host", "slot").count().collect()
    }
    assert all(v == 1 for (h, s), v in per.items() if h == "trap.com")
    assert all(v <= 5 for (h, s), v in per.items() if h == "ok.com")
    # unseen hosts (not in pages) get the default budget
    frontier2 = frontier.withColumn(
        "host", F.concat(F.lit("new-"), F.col("host"))
    )
    got2 = crawl.trap_aware_schedule(
        frontier2, "host", "prio", "url_id",
        pages_df, "host", "url", "text",
        per_host_budget=5, trap_budget=1,
    )
    assert {r.host_budget for r in got2.select("host_budget").distinct().collect()} == {5}


def test_trap_aware_schedule_rejects_bad_budgets(spark):
    df = spark.createDataFrame([(1, "h", 1.0)], "url_id long, host string, prio double")
    pg = spark.createDataFrame([("h", "u", "t")], "host string, url string, text string")
    with pytest.raises(ValueError):
        crawl.trap_aware_schedule(df, "host", "prio", "url_id", pg, "host", "url", "text", trap_budget=0)


# ------------------------------------------------- adaptive recrawl


def test_adaptive_recrawl_plan_priorities(spark):
    from csv_cruncher_spark.operators.crawl import adaptive_recrawl_plan

    # two urls on one host, same host budget: 'hot' changed on every
    # revisit, 'cold' never did -> hot must outrank cold
    rows = []
    for k in range(4):
        rows.append(("https://h.com/hot", 1000 + k * 100, k > 0))
        rows.append(("https://h.com/cold", 1000 + k * 100, False))
    # single-fetch url: no rate evidence -> NULL priority, ranked last
    rows.append(("https://h.com/once", 1300, False))
    df = spark.createDataFrame(rows, "url string, ts long, changed boolean")
    out = {
        r.url: r
        for r in adaptive_recrawl_plan(
            df, "url", "ts", "changed", now_ts=2000, per_host_budget=2
        ).collect()
    }
    assert set(out) == {"https://h.com/hot", "https://h.com/cold",
                        "https://h.com/once"}
    hot, cold, once = (out["https://h.com/hot"], out["https://h.com/cold"],
                       out["https://h.com/once"])
    assert hot.host == cold.host == "h.com"
    assert hot.last_fetch_ts == 1300 and hot.age_s == 700
    assert hot.expected_changes_micro > cold.expected_changes_micro
    assert cold.expected_changes_micro == 0  # zero detected changes
    assert once.changes_per_day_micro is None
    assert once.expected_changes_micro is None
    assert [hot.rank_in_host, cold.rank_in_host, once.rank_in_host] == [1, 2, 3]
    assert [hot.slot, cold.slot, once.slot] == [0, 0, 1]  # budget 2


def test_adaptive_recrawl_plan_now_before_fetch_is_negative(spark):
    from csv_cruncher_spark.operators.crawl import adaptive_recrawl_plan

    rows = [("https://h.com/a", 1000, False), ("https://h.com/a", 2000, True)]
    df = spark.createDataFrame(rows, "url string, ts long, changed boolean")
    r = adaptive_recrawl_plan(
        df, "url", "ts", "changed", now_ts=1500, per_host_budget=1
    ).head()
    assert r.age_s == -500
    assert r.expected_changes_micro < 0  # schedulable, sorts below stale


# ---------------------------------------------------- retry/backoff


def test_fetch_retry_plan_states(spark):
    from csv_cruncher_spark.operators.crawl import fetch_retry_plan

    rows = [
        # healthy: last fetch ok
        ("https://h.com/ok", 100, False), ("https://h.com/ok", 200, True),
        # retry, streak 1: backoff = base
        ("https://h.com/r1", 100, True), ("https://h.com/r1", 200, False),
        # retry, streak 2: backoff = 2*base
        ("https://h.com/r2", 100, True), ("https://h.com/r2", 200, False),
        ("https://h.com/r2", 300, False),
        # dead: 3 trailing failures, never succeeded
        ("https://h.com/d", 100, False), ("https://h.com/d", 200, False),
        ("https://h.com/d", 300, False),
        # backoff capped at max_delay_s
        ("https://h.com/cap", 50, True), ("https://h.com/cap", 100, False),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, ok boolean")
    out = {
        r.url: r
        for r in fetch_retry_plan(
            df, "url", "ts", "ok",
            max_attempts=3, base_delay_s=600, max_delay_s=700,
        ).collect()
    }
    ok = out["https://h.com/ok"]
    assert ok.state == "healthy" and ok.fail_streak == 0
    assert ok.next_retry_ts is None and ok.last_success_ts == 200
    r1 = out["https://h.com/r1"]
    assert r1.state == "retry" and r1.fail_streak == 1
    assert r1.next_retry_ts == 200 + 600
    r2 = out["https://h.com/r2"]
    assert r2.state == "retry" and r2.fail_streak == 2
    assert r2.next_retry_ts == 300 + 700  # 2*600 capped at 700
    d = out["https://h.com/d"]
    assert d.state == "dead" and d.fail_streak == 3
    assert d.last_success_ts is None and d.next_retry_ts is None
    cap = out["https://h.com/cap"]
    assert cap.state == "retry" and cap.next_retry_ts == 100 + 600


def test_fetch_retry_plan_arg_guards(spark):
    from csv_cruncher_spark.operators.crawl import fetch_retry_plan

    df = spark.createDataFrame(
        [("u", 1, True)], "url string, ts long, ok boolean"
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_attempts"):
        fetch_retry_plan(df, "url", "ts", "ok", max_attempts=0)
    with _pytest.raises(ValueError, match="base_delay_s"):
        fetch_retry_plan(df, "url", "ts", "ok", base_delay_s=0)
    with _pytest.raises(ValueError, match="base_delay_s"):
        fetch_retry_plan(df, "url", "ts", "ok",
                         base_delay_s=100, max_delay_s=50)


# ------------------------------------------------- politeness audit


def test_host_rate_audit_counts(spark):
    from csv_cruncher_spark.operators.crawl import host_rate_audit

    rows = (
        # h.com: window 0 has 3 fetches (1 over cap), window 1 has 1
        [("h.com", t) for t in (0, 10, 59, 60)]
        # calm.com: 2 fetches in 2 windows, no violations
        + [("calm.com", 5), ("calm.com", 65)]
        + [("h.com", None)]  # no instant -> drops
    )
    df = spark.createDataFrame(rows, "host string, ts long")
    rep = {
        r.host: r
        for r in host_rate_audit(
            df, "host", "ts", window_s=60, max_per_window=2
        ).collect()
    }
    h = rep["h.com"]
    assert (h.n_fetches, h.n_windows, h.max_per_window) == (4, 2, 3)
    assert h.n_violations == 1
    assert h.violation_share_micro == 250_000
    c = rep["calm.com"]
    assert (c.n_violations, c.max_per_window) == (0, 1)
    assert set(rep) == {"h.com", "calm.com"}


def test_schedule_eta_instants(spark):
    from csv_cruncher_spark.operators.crawl import crawl_schedule, schedule_eta

    frontier = spark.createDataFrame(
        [("slow.com", i, 10 - i) for i in range(4)]
        + [("fast.com", 10 + i, i) for i in range(3)],
        "host string, url_id long, prio long",
    )
    sched = crawl_schedule(frontier, "host", "prio", "url_id",
                           per_host_budget=2)
    delays = spark.createDataFrame([("slow.com", 30)],
                                   "host string, delay_s long")
    out = schedule_eta(sched, "host", delays=delays,
                       default_delay_s=5, t0=1000)
    got = {r.url_id: (r.delay_s, r.eta_ts) for r in out.collect()}
    # slow.com: slots 0,0,1,1 at 30s delay
    assert got[0] == (30, 1000)          # best prio, slot 0
    assert got[2][1] in (1000, 1030)
    slow_etas = sorted(got[i][1] for i in range(4))
    assert slow_etas == [1000, 1000, 1030, 1030]
    # fast.com absent from delays -> default 5s
    fast_etas = sorted(got[10 + i][1] for i in range(3))
    assert fast_etas == [1000, 1000, 1005]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------------ apportion_budget --


def test_apportion_budget_hand_computed(spark):
    from csv_cruncher_spark.operators.crawl import apportion_budget

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1)], ["host", "w"]
    )
    got = {
        r.host: r.quota for r in apportion_budget(df, "host", "w", 10).collect()
    }
    # R=9: base = [5,3,1] (sum 9), remainders = [5,3,1], L=1 -> 'a' +1
    assert got == {"a": 6, "b": 3, "c": 1}


def test_apportion_budget_sums_exactly_and_is_monotone(spark):
    import random

    from csv_cruncher_spark.operators.crawl import apportion_budget

    rng = random.Random(7)
    rows = [(f"h{i:03d}", rng.randrange(1, 1000)) for i in range(120)]
    df = spark.createDataFrame(rows, ["host", "w"])
    for budget in (1, 17, 1000, 99_991):
        out = {
            r.host: r.quota
            for r in apportion_budget(df, "host", "w", budget).collect()
        }
        assert sum(out.values()) == budget
    # monotone: a strictly heavier host never gets a smaller quota
    out = apportion_budget(df, "host", "w", 1000).collect()
    by_w = sorted(out, key=lambda r: (r.w, r.host))
    for lo, hi in zip(by_w, by_w[1:]):
        if hi.w > lo.w:
            assert hi.quota >= lo.quota


def test_apportion_budget_degenerate_and_clamps(spark):
    from csv_cruncher_spark.operators.crawl import apportion_budget

    # all-zero / NULL / negative weights: unallocatable -> all quotas 0
    df = spark.createDataFrame(
        [("a", 0), ("b", None), ("c", -4)], "host string, w int"
    )
    got = {
        r.host: r.quota for r in apportion_budget(df, "host", "w", 50).collect()
    }
    assert got == {"a": 0, "b": 0, "c": 0}
    # negative weight clamps to 0 but a positive sibling takes it all
    df2 = spark.createDataFrame([("a", -9), ("b", 2)], ["host", "w"])
    got2 = {
        r.host: r.quota
        for r in apportion_budget(df2, "host", "w", 7).collect()
    }
    assert got2 == {"a": 0, "b": 7}
    try:
        apportion_budget(df2, "host", "w", -1)
        raise AssertionError("expected ValueError for negative budget")
    except ValueError:
        pass
