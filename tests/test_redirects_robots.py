"""Redirect-chain resolution (operators/redirects.py), robots-style
allow/deny (operators/robots.py), and anchor-text profiling
(operators/links.py). Cross-engine bit-exactness is the
`url_redirect_resolution` / `robots_filtered_frontier` /
`anchor_text_profile` oracle entries (tests/test_oracle_parity.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_cruncher_spark.operators import release  # noqa: E402
from csv_cruncher_spark.operators.links import anchor_text_profile  # noqa: E402
from csv_cruncher_spark.operators.redirects import resolve_redirects  # noqa: E402
from csv_cruncher_spark.operators.robots import robots_filter  # noqa: E402


# ------------------------------------------------------------- redirects


def _resolve(spark, edges, rounds=4):
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    out = resolve_redirects(df, rounds=rounds)
    rows = {r["src"]: (r["final_url"], r["n_hops"], r["resolved"]) for r in out.collect()}
    release(out)
    return rows


def test_redirect_chain_resolves_with_hops(spark):
    # a → b → c → d (landing)
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": ("d", 3, True), "b": ("d", 2, True), "c": ("d", 1, True)}


def test_redirect_single_hop(spark):
    assert _resolve(spark, [("x", "y")]) == {"x": ("y", 1, True)}


def test_redirect_cycle_is_unresolved(spark):
    got = _resolve(spark, [("a", "b"), ("b", "a")], rounds=3)
    # 2-cycle orbits: after 2^3 hops each lands back on itself
    assert got["a"] == ("a", 8, False)
    assert got["b"] == ("b", 8, False)


def test_redirect_self_loop_unresolved(spark):
    got = _resolve(spark, [("s", "s")], rounds=2)
    assert got["s"] == ("s", 4, False)


def test_redirect_chain_longer_than_budget_unresolved(spark):
    # 5-hop chain, rounds=2 resolves only up to 4 hops
    edges = [(f"u{i}", f"u{i+1}") for i in range(5)]
    got = _resolve(spark, edges, rounds=2)
    assert got["u1"] == ("u5", 4, True)
    # u0 reaches u4 in 4 hops — but u4 still redirects
    assert got["u0"] == ("u4", 4, False)


def test_redirect_multi_target_keeps_min_dst(spark):
    got = _resolve(spark, [("a", "z"), ("a", "b")])
    assert got["a"] == ("b", 1, True)


def test_redirect_tail_into_cycle(spark):
    # t → a → b → a ...: never resolves
    got = _resolve(spark, [("t", "a"), ("a", "b"), ("b", "a")], rounds=3)
    assert got["t"][2] is False and got["a"][2] is False


# ---------------------------------------------------------------- robots


def _robots(spark, frontier_urls, rules):
    f = spark.createDataFrame([(u,) for u in frontier_urls], "url STRING")
    r = spark.createDataFrame(rules, "host STRING, path_prefix STRING, allow BOOLEAN")
    return {
        row["url"]: (row["is_allowed"], row["matched_prefix"])
        for row in robots_filter(f, r).collect()
    }


RULES = [
    ("ex.com", "/private/", False),
    ("ex.com", "/private/pub", True),
    ("ex.com", "/tmp", False),
]


def test_robots_longest_prefix_wins(spark):
    got = _robots(
        spark,
        [
            "https://ex.com/private/x",
            "https://ex.com/private/pub1",
            "https://ex.com/open/y",
        ],
        RULES,
    )
    assert got["https://ex.com/private/x"] == (False, "/private/")
    assert got["https://ex.com/private/pub1"] == (True, "/private/pub")
    assert got["https://ex.com/open/y"] == (True, None)


def test_robots_tie_allow_wins(spark):
    rules = [("ex.com", "/a/", False), ("ex.com", "/a/", True)]
    assert _robots(spark, ["https://ex.com/a/z"], rules)[
        "https://ex.com/a/z"
    ] == (True, "/a/")


def test_robots_unknown_host_and_bad_url_allowed(spark):
    got = _robots(spark, ["https://other.net/tmp", "::::not-a-url"], RULES)
    assert got["https://other.net/tmp"] == (True, None)
    assert got["::::not-a-url"] == (True, None)


def test_robots_root_path_and_empty_path(spark):
    rules = [("ex.com", "/", False)]
    got = _robots(spark, ["https://ex.com", "https://ex.com/x"], rules)
    # bare host means path '/', which the '/' rule matches
    assert got["https://ex.com"] == (False, "/")
    assert got["https://ex.com/x"] == (False, "/")


def test_robots_frontier_payload_survives(spark):
    f = spark.createDataFrame(
        [("https://ex.com/tmp/1", 7)], "url STRING, prio INT"
    )
    r = spark.createDataFrame(RULES, "host STRING, path_prefix STRING, allow BOOLEAN")
    row = robots_filter(f, r).collect()[0]
    assert row["prio"] == 7 and row["is_allowed"] is False


# ---------------------------------------------------------- anchor text


def test_anchor_profile_counts_and_top(spark):
    rows = [
        ("https://s.com/1", '<a href="https://t.com/x">Blue</a><a href="https://t.com/x">Blue</a>'),
        ("https://s.com/2", '<a href="https://t.com/x">Red</a><a href="https://t.com/x">Blue</a>'),
        ("https://s.com/3", '<a href="https://t.com/y">Solo</a><a href="https://t.com/x"></a>'),
    ]
    df = spark.createDataFrame(rows, "url STRING, html STRING")
    got = {
        r["outlink"]: (
            r["n_refs"],
            r["n_anchor_texts"],
            r["top_anchor"],
            r["top_anchor_n"],
        )
        for r in anchor_text_profile(df).collect()
    }
    # empty anchor never counts; Blue 3× beats Red 1×
    assert got["https://t.com/x"] == (4, 2, "Blue", 3)
    assert got["https://t.com/y"] == (1, 1, "Solo", 1)


def test_anchor_profile_tie_breaks_lexicographically(spark):
    rows = [("https://s.com/1", '<a href="https://t.com/z">beta</a><a href="https://t.com/z">alpha</a>')]
    df = spark.createDataFrame(rows, "url STRING, html STRING")
    r = anchor_text_profile(df).collect()[0]
    assert (r["top_anchor"], r["top_anchor_n"]) == ("alpha", 1)


def test_anchor_extraction_resolves_and_trims(spark):
    from csv_cruncher_spark.operators.links import extract_anchor_texts

    rows = [("https://s.com/a/p", '<a class="k" href="q.html">  spaced text </a><a href="#f">drop</a>')]
    df = spark.createDataFrame(rows, "url STRING, html STRING")
    got = [(r["outlink"], r["anchor"]) for r in extract_anchor_texts(df).collect()]
    assert got == [("https://s.com/a/q.html", "spaced text")]


def test_anchor_profile_plan_no_window_no_python(spark):
    df = spark.createDataFrame(
        [("https://s.com/1", '<a href="https://t.com/x">A</a>')],
        "url STRING, html STRING",
    )
    plan = (
        anchor_text_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "CartesianProduct" not in plan
