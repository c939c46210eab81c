"""Host-level crawl diagnostics: mirror pairs, trap report, change-rate
estimation (operators/mirrors.py, operators/crawl.py)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.operators.crawl import change_rate_estimates
from csv_cruncher_spark.operators.mirrors import (
    crawler_trap_report,
    host_mirror_pairs,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, text string")


# ---------------------------------------------------------------- mirrors


def test_mirror_pair_detected_with_exact_containment(spark):
    rows = [
        ("a.com", "u1", "page one"),
        ("a.com", "u2", "page two"),
        ("a.com", "u3", "page three"),
        ("b.com", "v1", "page one"),
        ("b.com", "v2", "page two"),
        ("c.com", "w1", "something else"),
    ]
    out = host_mirror_pairs(_pages(spark, rows), "host", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b) == ("a.com", "b.com")
    assert (r.shared, r.n_a, r.n_b) == (2, 3, 2)
    # b fully contained in a: floor(1e6 * 2/2)
    assert r.containment_micro == 1_000_000


def test_mirror_min_shared_and_containment_filters(spark):
    rows = [
        ("a.com", "u1", "x"),
        ("b.com", "v1", "x"),  # 1 shared fp only
        # c and d share 1 of c's 4 -> containment 250000 < default
        ("c.com", "c1", "s"),
        ("c.com", "c2", "c-only-2"),
        ("c.com", "c3", "c-only-3"),
        ("c.com", "c4", "c-only-4"),
        ("d.com", "d1", "s"),
        ("d.com", "d2", "s2"),
        ("d.com", "d3", "s3"),
        ("d.com", "d4", "s4"),
    ]
    out = host_mirror_pairs(_pages(spark, rows), "host", "text").collect()
    assert out == []  # a-b fails min_shared, c-d fails containment
    out2 = host_mirror_pairs(
        _pages(spark, rows), "host", "text",
        min_shared=1, min_containment_micro=0,
    ).collect()
    got = {(r.host_a, r.host_b): r.containment_micro for r in out2}
    assert got[("a.com", "b.com")] == 1_000_000
    assert got[("c.com", "d.com")] == 250_000


def test_mirror_stop_fingerprint_cap_and_null_text(spark):
    # 'boiler' is on 3 hosts; with cap 2 it must not pair anyone,
    # and it must not count toward host sizes either
    rows = [
        ("a.com", "u0", "boiler"),
        ("b.com", "v0", "boiler"),
        ("c.com", "w0", "boiler"),
        ("a.com", "u1", "real"),
        ("b.com", "v1", "real"),
        ("a.com", "u2", None),
        ("b.com", "v2", None),
    ]
    out = host_mirror_pairs(
        _pages(spark, rows), "host", "text",
        min_shared=1, max_hosts_per_fp=2,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b, r.shared, r.n_a, r.n_b) == (
        "a.com", "b.com", 1, 1, 1
    )


def test_mirror_duplicate_urls_collapse_to_distinct_fps(spark):
    # same host serving the same text on many urls is ONE fingerprint
    rows = [("a.com", f"u{i}", "same") for i in range(5)] + [
        ("b.com", "v", "same")
    ]
    out = host_mirror_pairs(
        _pages(spark, rows), "host", "text", min_shared=1
    ).collect()
    assert len(out) == 1
    assert (out[0].n_a, out[0].n_b, out[0].shared) == (1, 1, 1)


def test_mirror_validation(spark):
    df = _pages(spark, [("a.com", "u", "t")])
    with pytest.raises(ValueError):
        host_mirror_pairs(df, "host", "text", min_shared=0)
    with pytest.raises(ValueError):
        host_mirror_pairs(df, "host", "text", max_hosts_per_fp=1)


def test_mirror_plan_no_cartesian(spark):
    rows = [("a.com", "u1", "x"), ("b.com", "v1", "x")]
    df = host_mirror_pairs(_pages(spark, rows), "host", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ trap report


def test_trap_flagged_and_normal_host_not(spark):
    rows = []
    # trap: 12 urls, 2 contents, query strings
    for i in range(12):
        rows.append(
            ("trap.com", f"https://trap.com/l?page={i}", f"c{i % 2}")
        )
    # normal: 12 urls, 12 contents
    for i in range(12):
        rows.append(("ok.com", f"https://ok.com/{i}", f"page {i}"))
    out = {
        r.host: r
        for r in crawler_trap_report(
            _pages(spark, rows), "host", "url", "text"
        ).collect()
    }
    t = out["trap.com"]
    assert (t.n_urls, t.n_content, t.n_param_urls) == (12, 2, 12)
    assert t.dup_ratio_micro == (12 - 2) * 1_000_000 // 12
    assert t.is_trap
    o = out["ok.com"]
    assert (o.n_urls, o.n_content, o.n_param_urls) == (12, 12, 0)
    assert o.dup_ratio_micro == 0 and not o.is_trap


def test_trap_null_text_is_one_content_class(spark):
    rows = [("h.com", f"https://h.com/{i}?x=1", None) for i in range(10)]
    out = crawler_trap_report(
        _pages(spark, rows), "host", "url", "text"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_urls, r.n_content) == (10, 1)
    assert r.is_trap


def test_trap_min_urls_floor(spark):
    rows = [("h.com", f"https://h.com/l?p={i}", "same") for i in range(5)]
    out = crawler_trap_report(
        _pages(spark, rows), "host", "url", "text", min_urls=10
    ).collect()[0]
    assert out.dup_ratio_micro == 800_000 and not out.is_trap


# ------------------------------------------------------- change rate


def _visits(spark, rows):
    return spark.createDataFrame(rows, "url string, ts long, changed boolean")


def test_change_rate_matches_closed_form(spark):
    rows = [
        ("u", 1000, False),
        ("u", 2000, True),
        ("u", 3000, False),
        ("u", 4000, True),
        ("u", 5000, False),
    ]
    r = change_rate_estimates(_visits(spark, rows), "url", "ts", "changed").collect()[0]
    assert (r.n_visits, r.n_changes, r.span_s) == (5, 2, 4000)
    expect = round(-math.log((4 - 2 + 0.5) / (4 + 0.5)) * 1_000_000)
    assert r.rhat_micro == expect
    assert r.changes_per_day_micro == r.rhat_micro * 86400 * 4 // 4000


def test_change_rate_clamps_changes_to_revisits(spark):
    # malformed history: every fetch (incl. the first) marked changed
    rows = [("u", t, True) for t in (0, 10, 20)]
    r = change_rate_estimates(_visits(spark, rows), "url", "ts", "changed").collect()[0]
    assert r.n_changes == 2  # clamped to n_visits - 1
    assert r.rhat_micro == round(-math.log(0.5 / 2.5) * 1_000_000)


def test_change_rate_excludes_single_visit_and_null_span(spark):
    rows = [
        ("once", 100, False),
        ("same_ts", 100, False),
        ("same_ts", 100, True),
    ]
    out = {r.url: r for r in change_rate_estimates(
        _visits(spark, rows), "url", "ts", "changed"
    ).collect()}
    assert "once" not in out
    r = out["same_ts"]
    assert r.span_s == 0 and r.changes_per_day_micro is None
    assert r.rhat_micro == round(-math.log(0.5 / 1.5) * 1_000_000)


def test_change_rate_no_changes_is_zero_rate_floor(spark):
    rows = [("u", t, False) for t in (0, 100, 200, 300)]
    r = change_rate_estimates(_visits(spark, rows), "url", "ts", "changed").collect()[0]
    # x = 0: rhat = -ln((3+0.5)/(3+0.5)) = 0
    assert r.rhat_micro == 0 and r.changes_per_day_micro == 0


# ------------------------------------------------- canonical url election


def test_canonical_election_shortest_then_lex(spark):
    from csv_cruncher_spark.operators.mirrors import canonical_url_election

    rows = [
        ("h", "https://a.com/page?ref=rss", "same"),
        ("h", "https://a.com/page", "same"),
        ("h", "https://b.com/pg", "same"),      # shorter wins
        ("h", "https://a.com/pg", "same"),      # same length, lex smaller
        ("h", "https://c.com/other", "other"),
        ("h", "https://c.com/null", None),      # excluded
    ]
    df = spark.createDataFrame(rows, "host string, url string, text string")
    out = canonical_url_election(df, "url", "text").collect()
    got = {r.url: (r.canonical_url, r.n_spellings) for r in out}
    assert len(got) == 5
    for u in ("https://a.com/page?ref=rss", "https://a.com/page",
              "https://b.com/pg", "https://a.com/pg"):
        assert got[u] == ("https://a.com/pg", 4)
    assert got["https://c.com/other"] == ("https://c.com/other", 1)


def test_canonical_election_url_serving_two_contents(spark):
    from csv_cruncher_spark.operators.mirrors import canonical_url_election

    rows = [
        ("h", "https://x.com/a", "v1"),
        ("h", "https://x.com/a", "v2"),
        ("h", "https://y.com/long-one", "v2"),
    ]
    df = spark.createDataFrame(rows, "host string, url string, text string")
    out = canonical_url_election(df, "url", "text").collect()
    # x.com/a appears once per content it served
    rows_x = [r for r in out if r.url == "https://x.com/a"]
    assert len(rows_x) == 2
    assert {r.canonical_url for r in rows_x} == {"https://x.com/a"}


# ------------------------------------------------------ url param profile


def test_param_profile_session_vs_stable(spark):
    from csv_cruncher_spark.operators.urlfilter import url_param_profile

    rows = []
    for i in range(20):
        rows.append(("h", f"https://h/p?sid={i}&lang=en"))
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r.param: r for r in url_param_profile(df, "host", "url").collect()}
    sid = out["sid"]
    assert (sid.n_occurrences, sid.n_distinct_values, sid.n_urls) == (20, 20, 20)
    assert sid.distinct_ratio_micro == 1_000_000 and sid.is_session_like
    lang = out["lang"]
    assert (lang.n_occurrences, lang.n_distinct_values) == (20, 1)
    assert lang.distinct_ratio_micro == 50_000 and not lang.is_session_like


def test_param_profile_parsing_edges(spark):
    from csv_cruncher_spark.operators.urlfilter import url_param_profile

    rows = [
        ("h", "https://h/p?a=1&b&c=x=y#frag?d=9"),  # b valueless, c nested =, d in fragment
        ("h", "https://h/p"),                        # no query: no rows
        ("h", "https://h/p?"),                       # empty query: no rows
    ]
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r.param: r for r in url_param_profile(df, "host", "url", min_occurrences=1).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["b"].n_distinct_values == 1  # the empty value
    assert out["c"].n_occurrences == 1


def test_param_profile_min_occurrences_gate(spark):
    from csv_cruncher_spark.operators.urlfilter import url_param_profile

    rows = [("h", "https://h/p?one=%d" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "host string, url string")
    r = url_param_profile(df, "host", "url", min_occurrences=5).collect()[0]
    assert r.distinct_ratio_micro == 1_000_000 and not r.is_session_like
    import pytest as _pytest
    with _pytest.raises(ValueError):
        url_param_profile(df, "host", "url", min_occurrences=0)


# ------------------------------------------------------ soft errors


from csv_cruncher_spark.operators.mirrors import (  # noqa: E402
    soft_error_filter,
    soft_error_report,
)

SOFT_ROWS = (
    # h.com: 4 of 10 urls serve the same short 404 template
    [("h.com", "https://h.com/%d" % i, "404 not found") for i in range(4)]
    + [("h.com", "https://h.com/%d" % i, "real article %d " % i + "x" * 300)
       for i in range(4, 10)]
    # long.com: a LONG text dominates (mirror, not a soft error)
    + [("long.com", "https://long.com/%d" % i, "y" * 500) for i in range(5)]
    # small.com: short dup text but only 2 urls (< min_urls)
    + [("small.com", "https://small.com/%d" % i, "oops") for i in range(2)]
    + [("h.com", "https://h.com/null", None)]  # no content evidence
)


@pytest.fixture(scope="module")
def soft_df(spark):
    return spark.createDataFrame(
        SOFT_ROWS, "host string, url string, text string"
    )


def test_soft_error_report_flags(soft_df):
    rep = soft_error_report(
        soft_df, "host", "url", "text",
        min_urls=3, min_share_micro=150_000, max_text_len=64,
    ).collect()
    flagged = {(r.host, r.text_len) for r in rep if r.is_soft_error}
    assert flagged == {("h.com", 13)}  # only the 404 template
    r404 = next(r for r in rep if r.is_soft_error)
    assert r404.n_urls == 4 and r404.n_host_urls == 10
    assert r404.share_micro == 400_000
    assert r404.sample_url == "https://h.com/0"
    # the long dominant text fails the length gate
    longs = [r for r in rep if r.host == "long.com"]
    assert len(longs) == 1 and not longs[0].is_soft_error
    # too few urls fails the count gate
    smalls = [r for r in rep if r.host == "small.com"]
    assert len(smalls) == 1 and not smalls[0].is_soft_error
    # NULL text carries no evidence: h.com totals exclude the null url
    assert all(r.n_host_urls == 10 for r in rep if r.host == "h.com")


def test_soft_error_filter_modes(soft_df):
    kw = dict(min_urls=3, min_share_micro=150_000, max_text_len=64)
    blocked = soft_error_filter(
        soft_df, "host", "url", "text", keep="blocked", **kw
    ).collect()
    assert {r.url for r in blocked} == {"https://h.com/%d" % i for i in range(4)}
    allowed = soft_error_filter(
        soft_df, "host", "url", "text", keep="allowed", **kw
    ).collect()
    assert len(allowed) == len(SOFT_ROWS) - 4
    assert any(r.url == "https://h.com/null" for r in allowed)  # NULL kept
    flag = soft_error_filter(
        soft_df, "host", "url", "text", keep="flag", **kw
    ).collect()
    assert len(flag) == len(SOFT_ROWS)
    assert sum(r.soft_error for r in flag) == 4


def test_soft_error_filter_broadcasts(soft_df):
    plan = (
        soft_error_filter(soft_df, "host", "url", "text", keep="flag")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_soft_error_bad_args(soft_df):
    with pytest.raises(ValueError, match="keep"):
        soft_error_filter(soft_df, "host", "url", "text", keep="nope")
    with pytest.raises(ValueError, match="min_urls"):
        soft_error_report(soft_df, "host", "url", "text", min_urls=0)
