"""Domain-blocklist URL filtering (operators/urlfilter.py).

Pins the label-boundary suffix semantics (notexample.com is NOT blocked
by example.com), the three keep modes, literal-path ≡ DataFrame-path
agreement, the no-host conservative posture, and the plan shapes: the
literal path is a pure projection (no exchange at all), the DataFrame
path broadcasts the blocklist.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.operators.urlfilter import (  # noqa: E402
    LITERAL_BLOCKLIST_LIMIT,
    blocklist_filter,
    host_suffixes,
)

URLS = [
    (0, "https://www.example.com/a"),          # blocked: suffix of example.com
    (1, "https://example.com/b"),              # blocked: exact
    (2, "https://notexample.com/c"),           # NOT blocked: label boundary
    (3, "https://ads.tracker.example.com/d"),  # blocked: deep suffix
    (4, "https://safe.org/e"),                 # allowed
    (5, "https://EXAMPLE.COM:443/f"),          # blocked: case+default port fold
    (6, "https://example.com:8443/g"),         # blocked: port never matches a domain
    (7, "not a url at all"),                   # no host -> never blocked
    (8, None),                                 # NULL url -> never blocked
    (9, "https://com/h"),                      # blocked only if 'com' listed (it isn't)
]
BLOCK = ["example.com", "tracker.test"]
EXPECT_BLOCKED = {0, 1, 3, 5, 6}


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_host_suffixes_order_and_boundaries(spark):
    row = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s")
    ).head()
    assert row.s == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_flag_mode_matches_expectation(urls_df):
    got = {
        r.doc_id: r.blocked
        for r in blocklist_filter(urls_df, "url", BLOCK, keep="flag").collect()
    }
    assert set(got) == {d for d, _ in URLS}
    for d, b in got.items():
        assert b == (d in EXPECT_BLOCKED), f"doc {d}: blocked={b}"


def test_allowed_and_blocked_partition_the_input(urls_df):
    allowed = blocklist_filter(urls_df, "url", BLOCK, keep="allowed")
    blocked = blocklist_filter(urls_df, "url", BLOCK, keep="blocked")
    a = {r.doc_id for r in allowed.collect()}
    b = {r.doc_id for r in blocked.collect()}
    assert b == EXPECT_BLOCKED
    assert a == {d for d, _ in URLS} - EXPECT_BLOCKED
    assert "blocked" not in allowed.columns
    # payload columns survive the filter
    assert set(allowed.columns) == {"doc_id", "url"}


def test_dataframe_path_agrees_with_literal_path(spark, urls_df):
    bdf = spark.createDataFrame([(d,) for d in BLOCK], "domain string")
    lit = blocklist_filter(urls_df, "url", BLOCK, keep="flag")
    dfp = blocklist_filter(urls_df, "url", bdf, keep="flag")
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, dfp.collect()))


def test_blocklist_case_insensitive(urls_df):
    got = blocklist_filter(urls_df, "url", ["EXAMPLE.COM"], keep="blocked")
    assert {r.doc_id for r in got.collect()} == EXPECT_BLOCKED


def test_literal_limit_enforced(urls_df):
    big = [f"d{i}.test" for i in range(LITERAL_BLOCKLIST_LIMIT + 1)]
    with pytest.raises(ValueError, match="exceeds"):
        blocklist_filter(urls_df, "url", big)


def test_bad_keep_rejected(urls_df):
    with pytest.raises(ValueError, match="keep"):
        blocklist_filter(urls_df, "url", BLOCK, keep="nope")


def test_literal_path_plan_is_pure_projection(urls_df):
    plan = blocklist_filter(urls_df, "url", BLOCK, keep="flag")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_dataframe_path_broadcasts_blocklist(spark, urls_df):
    bdf = spark.createDataFrame([(d,) for d in BLOCK], "domain string")
    plan = blocklist_filter(urls_df, "url", bdf, keep="flag")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------- strip


from csv_cruncher_spark.operators.urlfilter import (  # noqa: E402
    LITERAL_STRIP_LIMIT,
    canonicalize_by_profile,
    strip_params,
    url_param_profile,
)

STRIP_ROWS = [
    ("a.com", "https://a.com/p?sid=1&lang=en&page=2"),
    ("a.com", "https://a.com/p?lang=en"),
    ("a.com", "https://a.com/p?sid=9"),            # query vanishes entirely
    ("a.com", "https://a.com/p"),                  # no query at all
    ("a.com", "https://a.com/p?sid=3&&x&lang#f?sid=keep"),  # frag survives
    ("b.com", "https://b.com/p?sid=7&lang=en"),    # host not in strip set
    (None, "https://c.com/p?sid=5&&z=1"),          # NULL host: params kept
    ("a.com", None),                               # NULL url stays NULL
]
STRIP = {"a.com": ["sid"]}
EXPECT = {
    "https://a.com/p?sid=1&lang=en&page=2": "https://a.com/p?lang=en&page=2",
    "https://a.com/p?lang=en": "https://a.com/p?lang=en",
    "https://a.com/p?sid=9": "https://a.com/p",
    "https://a.com/p": "https://a.com/p",
    # sid stripped, '&&' empty pair dropped, un-named 'x'/'lang' pairs
    # kept, fragment (incl. its '?sid=keep' bytes) untouched
    "https://a.com/p?sid=3&&x&lang#f?sid=keep": "https://a.com/p?x&lang#f?sid=keep",
    "https://b.com/p?sid=7&lang=en": "https://b.com/p?sid=7&lang=en",
    "https://c.com/p?sid=5&&z=1": "https://c.com/p?sid=5&z=1",
    None: None,
}


@pytest.fixture(scope="module")
def strip_df(spark):
    return spark.createDataFrame(STRIP_ROWS, "host string, url string")


def test_strip_literal_semantics(strip_df):
    got = {
        r.url: r.canonical_url
        for r in strip_params(strip_df, "host", "url", STRIP).collect()
    }
    assert got == EXPECT


def test_strip_join_path_agrees_with_literal(spark, strip_df):
    sdf = spark.createDataFrame([("a.com", "sid")], "host string, param string")
    got = {
        r.url: r.canonical_url
        for r in strip_params(strip_df, "host", "url", sdf).collect()
    }
    assert got == EXPECT


def test_strip_literal_plan_is_pure_projection(strip_df):
    plan = (
        strip_params(strip_df, "host", "url", STRIP)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_strip_join_path_broadcasts_strip_frame(spark, strip_df):
    sdf = spark.createDataFrame([("a.com", "sid")], "host string, param string")
    plan = (
        strip_params(strip_df, "host", "url", sdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_strip_literal_limit_enforced(strip_df):
    big = {"h%d.com" % i: ["a"] for i in range(LITERAL_STRIP_LIMIT + 1)}
    with pytest.raises(ValueError, match="strip set"):
        strip_params(strip_df, "host", "url", big)


def test_canonicalize_by_profile_end_to_end(spark):
    # 20 URLs on one host: 'sid' unique per URL (flagged), 'k' constant
    # (kept); a second host below min_occurrences keeps everything
    rows = [
        ("h.com", "https://h.com/x?sid=%d&k=1" % i) for i in range(20)
    ] + [("tiny.com", "https://tiny.com/x?sid=%d" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "host string, url string")
    out = {
        r.url: r.canonical_url
        for r in canonicalize_by_profile(
            df, "host", "url", min_occurrences=5
        ).collect()
    }
    for i in range(20):
        assert out["https://h.com/x?sid=%d&k=1" % i] == "https://h.com/x?k=1"
    for i in range(3):
        assert out["https://tiny.com/x?sid=%d" % i] == "https://tiny.com/x?sid=%d" % i


def test_canonicalize_by_profile_guard(spark):
    rows = [("h%d.com" % i, "https://h%d.com/x?s=%d" % (i, j))
            for i in range(4) for j in range(6)]
    df = spark.createDataFrame(rows, "host string, url string")
    with pytest.raises(ValueError, match="flagged more than"):
        canonicalize_by_profile(
            df, "host", "url", min_occurrences=5, max_strip_rows=2
        )


def test_url_param_profile_flags_session_param(spark):
    rows = [("h.com", "https://h.com/x?sid=%d&lang=en" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "host string, url string")
    prof = {r.param: r for r in url_param_profile(df, "host", "url").collect()}
    assert prof["sid"].is_session_like
    assert prof["sid"].distinct_ratio_micro == 1_000_000
    assert not prof["lang"].is_session_like
    assert prof["lang"].n_distinct_values == 1


def test_strip_fragment_question_mark_is_not_a_query(spark):
    # regression (hypothesis-caught): a '?' INSIDE the fragment must not
    # be parsed as a query — the rewrite used to duplicate '#f?a=1'
    # bytes into a fabricated '?a=1' query
    df = spark.createDataFrame(
        [("h1.com", "https://h1.com/p#f?a=1"),
         ("h1.com", "https://h1.com/p#f?sid=1")],
        "host string, url string",
    )
    got = {
        r.url: r.canonical_url
        for r in strip_params(df, "host", "url", {"h1.com": ["sid", "a"]}).collect()
    }
    assert got["https://h1.com/p#f?a=1"] == "https://h1.com/p#f?a=1"
    assert got["https://h1.com/p#f?sid=1"] == "https://h1.com/p#f?sid=1"
    prof = url_param_profile(df, "host", "url", min_occurrences=1).collect()
    assert prof == []  # no query at all -> nothing to profile
