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
