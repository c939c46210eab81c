"""Property tests (Hypothesis) for the crawl-ops wave, against
pure-Python references computed per example:

  - fetch_retry_plan on random fetch logs: trailing-failure streak,
    state classification, and the capped exponential backoff replay
    exactly in pure Python (the two-aggregation Spark formulation must
    equal the obvious sort-and-scan one);
  - strip_params: the zero-shuffle literal path and the broadcast join
    path agree on random URL/strip-set combinations, and both equal a
    pure-Python split/filter/join replay of the documented semantics;
  - url_churn_report on random URL sets equals Python set arithmetic
    per host.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from csv_cruncher_spark.operators.crawl import fetch_retry_plan  # noqa: E402
from csv_cruncher_spark.operators.snapshot import url_churn_report  # noqa: E402
from csv_cruncher_spark.operators.urlfilter import strip_params  # noqa: E402

# --- fetch logs: per url a sequence of ok/fail outcomes (ts = index) ---
fetch_log = st.dictionaries(
    st.sampled_from([f"https://h{i}.com/p" for i in range(4)]),
    st.lists(st.booleans(), min_size=1, max_size=6),
    min_size=1,
    max_size=4,
)


def _retry_replay(outcomes, max_attempts, base, cap):
    n = len(outcomes)
    last_ts = n - 1
    last_ok = outcomes[-1]
    last_success_ts = max(
        (i for i, ok in enumerate(outcomes) if ok), default=None
    )
    streak = (
        n if last_success_ts is None else n - 1 - last_success_ts
    )
    if last_ok:
        state = "healthy"
    elif streak >= max_attempts:
        state = "dead"
    else:
        state = "retry"
    next_retry = (
        last_ts + min(base * 2 ** (streak - 1), cap)
        if state == "retry"
        else None
    )
    return (n, last_ts, last_ok, last_success_ts, streak, state, next_retry)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=fetch_log, max_attempts=st.integers(1, 5))
def test_fetch_retry_plan_python_replay(spark, log, max_attempts):
    rows = [
        (url, ts, ok)
        for url, outcomes in log.items()
        for ts, ok in enumerate(outcomes)
    ]
    df = spark.createDataFrame(rows, "url string, ts long, ok boolean")
    got = {
        r.url: r
        for r in fetch_retry_plan(
            df, "url", "ts", "ok",
            max_attempts=max_attempts, base_delay_s=10, max_delay_s=50,
        ).collect()
    }
    assert set(got) == set(log)
    for url, outcomes in log.items():
        n, last_ts, last_ok, ls, streak, state, nxt = _retry_replay(
            outcomes, max_attempts, 10, 50
        )
        r = got[url]
        assert (r.n_fetches, r.last_ts, r.last_ok) == (n, last_ts, last_ok)
        assert r.last_success_ts == ls
        assert r.fail_streak == streak
        assert r.state == state
        assert r.next_retry_ts == nxt


# --- URLs: small alphabets so strip sets actually hit ---
param_name = st.sampled_from(["a", "b", "sid", ""])
pair = st.tuples(param_name, st.integers(0, 3)).map(
    lambda t: f"{t[0]}={t[1]}"
)
query = st.lists(
    st.one_of(pair, st.sampled_from(["", "bare", "a"])), max_size=4
).map("&".join)
url_strat = st.tuples(
    st.sampled_from(["h1.com", "h2.com"]),
    query,
    st.sampled_from(["", "#f", "#f?a=1"]),
).map(lambda t: (t[0], f"https://{t[0]}/p" + (f"?{t[1]}" if t[1] else "") + t[2]))


def _strip_replay(url, drop):
    import re

    m = re.match(r"^([^?#]*)(\?([^#]*))?(#.*)?$", url)
    prefix, q, frag = m.group(1), m.group(3) or "", m.group(4) or ""
    kept = [
        p for p in q.split("&")
        if p != "" and re.match(r"^([^=]*)", p).group(1) not in drop
    ]
    newq = "&".join(kept)
    return prefix + (f"?{newq}" if newq else "") + frag


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    urls=st.lists(url_strat, min_size=1, max_size=6),
    drop=st.sets(st.sampled_from(["a", "sid", ""]), max_size=3),
)
def test_strip_params_paths_agree_and_replay(spark, urls, drop):
    df = spark.createDataFrame(urls, "host string, url string")
    strip = {"h1.com": sorted(drop)}
    lit_out = {
        (r.host, r.url): r.canonical_url
        for r in strip_params(df, "host", "url", strip).collect()
    }
    sdf = spark.createDataFrame(
        [("h1.com", p) for p in sorted(drop)] or [("h1.com", "__never__")],
        "host string, param string",
    )
    join_out = {
        (r.host, r.url): r.canonical_url
        for r in strip_params(df, "host", "url", sdf).collect()
    }
    assert lit_out == join_out
    for (host, url), canon in lit_out.items():
        expect = _strip_replay(url, drop if host == "h1.com" else set())
        assert canon == expect, (url, sorted(drop), canon, expect)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    old=st.sets(st.tuples(st.sampled_from("hk"), st.integers(0, 9)), max_size=12),
    new=st.sets(st.tuples(st.sampled_from("hk"), st.integers(0, 9)), max_size=12),
)
def test_url_churn_python_replay(spark, old, new):
    mk = lambda s: [(h, f"https://{h}.com/{i}") for h, i in s]  # noqa: E731
    odf = spark.createDataFrame(
        mk(old) or [("z", None)], "host string, url string"
    )
    ndf = spark.createDataFrame(
        mk(new) or [("z", None)], "host string, url string"
    )
    rep = {
        r.host: r for r in url_churn_report(odf, ndf, "host", "url").collect()
    }
    hosts = {h for h, _ in old} | {h for h, _ in new}
    assert set(rep) == hosts
    for h in hosts:
        o = {u for hh, u in old if hh == h}
        n = {u for hh, u in new if hh == h}
        r = rep[h]
        assert (r.n_old, r.n_new) == (len(o), len(n))
        assert r.n_added == len(n - o)
        assert r.n_removed == len(o - n)
        assert r.n_kept == len(o & n)
        assert r.churn_micro == (len(o ^ n) * 1_000_000) // len(o | n)
