"""SCD Type 2 history: build, collapse, delete gaps, round-trip,
incremental-apply ≡ full-rebuild, point-in-time lookup."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import scd

PAY = ["text", "lang"]


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts long, op string, text string, lang string, row_idx long"
    )


def _hist_rows(df):
    return sorted(
        (r.url, r.valid_from, r.valid_to, r.is_current, r.text, r.lang)
        for r in df.collect()
    )


@pytest.fixture()
def base_log(spark):
    return _log(
        spark,
        [
            # a: two versions, still current
            ("a", 10, "I", "a-v1", "en", 0),
            ("a", 20, "U", "a-v2", "en", 1),
            # b: insert, delete, re-insert (mid-timeline gap), delete again
            ("b", 10, "I", "b-v1", "de", 2),
            ("b", 15, "D", None, None, 3),
            ("b", 30, "I", "b-v2", "de", 4),
            ("b", 40, "D", None, None, 5),
            # c: single version forever
            ("c", 5, "I", "c-v1", "fr", 6),
            # d: duplicate (key, ts) — row_idx 8 wins
            ("d", 7, "I", "d-old", "en", 7),
            ("d", 7, "U", "d-new", "en", 8),
        ],
    )


def test_build_intervals_and_deletes(spark, base_log):
    h = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    assert _hist_rows(h) == [
        ("a", 10, 20, False, "a-v1", "en"),
        ("a", 20, None, True, "a-v2", "en"),
        ("b", 10, 15, False, "b-v1", "de"),
        ("b", 30, 40, False, "b-v2", "de"),
        ("c", 5, None, True, "c-v1", "fr"),
        ("d", 7, None, True, "d-new", "en"),
    ]


def test_collapse_unchanged_extends_interval(spark):
    log = _log(
        spark,
        [
            ("a", 10, "I", "same", "en", 0),
            ("a", 20, "U", "same", "en", 1),  # identical re-fetch
            ("a", 30, "U", "diff", "en", 2),
            # delete between equal payloads must NOT collapse across the gap
            ("b", 10, "I", "same", "en", 3),
            ("b", 20, "D", None, None, 4),
            ("b", 30, "I", "same", "en", 5),
        ],
    )
    h = scd.scd2_history(
        log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx", collapse_unchanged=True
    )
    assert _hist_rows(h) == [
        ("a", 10, 30, False, "same", "en"),
        ("a", 30, None, True, "diff", "en"),
        ("b", 10, 20, False, "same", "en"),
        ("b", 30, None, True, "same", "en"),
    ]


def test_null_payload_runs_collapse(spark):
    log = _log(
        spark,
        [
            ("a", 10, "I", None, None, 0),
            ("a", 20, "U", None, None, 1),  # NULL == NULL for collapse
            ("a", 30, "U", "x", None, 2),
        ],
    )
    h = scd.scd2_history(
        log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx", collapse_unchanged=True
    )
    assert _hist_rows(h) == [
        ("a", 10, 30, False, None, None),
        ("a", 30, None, True, "x", None),
    ]


def test_round_trip_with_mid_gap(spark, base_log):
    h = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    replay = scd.history_to_changes(h, "url", PAY)
    h2 = scd.scd2_history(replay, "url", "ts", PAY, op_col="op")
    assert _hist_rows(h) == _hist_rows(h2)


def test_apply_equals_full_rebuild(spark, base_log):
    batch = _log(
        spark,
        [
            ("a", 30, "U", "a-v3", "en", 100),   # new version of current key
            ("b", 50, "I", "b-v3", "de", 101),   # re-insert after delete
            ("e", 25, "I", "e-v1", "es", 102),   # brand-new key
            ("a", 15, "U", "a-mid", "en", 103),  # LATE row splices mid-timeline
            ("c", 99, "D", None, None, 104),     # delete a current key
        ],
    )
    h1 = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    inc = scd.scd2_apply(h1, batch, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    full = scd.scd2_history(
        base_log.unionByName(batch), "url", "ts", PAY, op_col="op", tiebreak_col="row_idx"
    )
    assert _hist_rows(inc) == _hist_rows(full)
    # the late a@15 row must have spliced: a-v1 now closes at 15
    rows = {(r.url, r.valid_from): (r.valid_to, r.text) for r in inc.collect()}
    assert rows[("a", 10)] == (15, "a-v1")
    assert rows[("a", 15)] == (20, "a-mid")


def test_apply_untouched_keys_pass_through_unshuffled(spark, base_log):
    batch = _log(spark, [("zz", 1, "I", "z", "en", 0)])
    h1 = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    out = scd.scd2_apply(h1, batch, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    assert _hist_rows(h1) == [r for r in _hist_rows(out) if r[0] != "zz"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # history flows through broadcast anti/semi joins — no hash exchange
    # of the history side for untouched keys
    assert "BroadcastHashJoin" in plan


def test_asof_lookup_half_open(spark, base_log):
    h = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    at = lambda t: {r.url: r.text for r in scd.asof_lookup(h, t).collect()}
    assert at(12) == {"a": "a-v1", "b": "b-v1", "c": "c-v1", "d": "d-new"}
    # t=15: b's delete instant — interval [10,15) excludes 15
    assert "b" not in at(15)
    # t=30: b re-inserted at exactly 30 — half-open start includes it
    assert at(30)["b"] == "b-v2"
    assert at(45).keys() == {"a", "c", "d"}  # b deleted again at 40


def test_no_op_col_means_upserts(spark):
    log = spark.createDataFrame(
        [("a", 1, "x", "en", 0), ("a", 2, "y", "en", 1)],
        "url string, ts long, text string, lang string, row_idx long",
    )
    h = scd.scd2_history(log, "url", "ts", PAY, tiebreak_col="row_idx")
    assert _hist_rows(h) == [
        ("a", 1, 2, False, "x", "en"),
        ("a", 2, None, True, "y", "en"),
    ]


def test_single_exchange_single_sort(spark, base_log):
    """The build plans ONE hash exchange on the key and ONE sort shared
    by the LWW + interval windows (collapse adds lag/sum over the same
    sort)."""
    h = scd.scd2_history(
        base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx",
        collapse_unchanged=True,
    )
    plan = h._jdf.queryExecution().executedPlan().toString()
    # the LWW window partitions by (key, ts) and the interval windows by
    # (key) — hashpartitioning(url, ts) then hashpartitioning(url); no
    # third exchange may appear
    assert plan.count("Exchange hashpartitioning") <= 2


def test_prune_history_retention(spark, base_log):
    h = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    # horizon 25: b's v1 [10,15) expired (valid_to 15 < 25); a's v1
    # [10,20) expired but it is a's ONLY closed version -> kept by
    # keep_last=1; b's v2 [30,40) is b's most recent closed -> kept.
    pruned = scd.prune_history(h, "url", older_than=25)
    kept = {(r.url, r.valid_from) for r in pruned.collect()}
    assert ("b", 10) not in kept
    assert kept == {("a", 10), ("a", 20), ("b", 30), ("c", 5), ("d", 7)}
    # with keep_last=0 every expired closed version goes
    pruned0 = scd.prune_history(h, "url", older_than=25, keep_last=0)
    kept0 = {(r.url, r.valid_from) for r in pruned0.collect()}
    assert kept0 == {("a", 20), ("b", 30), ("c", 5), ("d", 7)}
    # asof correctness preserved at any t >= horizon
    for t in (25, 30, 35, 45):
        want = sorted((r.url, r.text) for r in scd.asof_lookup(h, t).collect())
        got = sorted((r.url, r.text) for r in scd.asof_lookup(pruned0, t).collect())
        assert got == want, t


def test_prune_history_single_window_no_join(spark, base_log):
    h = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    plan = scd.prune_history(h, "url", older_than=25)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_apply_shuffle_fallback_above_broadcast_limit(spark, base_log):
    """A bulk-load batch above the key-broadcast limit must still apply
    exactly (shuffle joins), identical to the broadcast path."""
    batch = _log(spark, [("a", 30, "U", "a-v3", "en", 100),
                         ("zz", 1, "I", "z", "en", 101)])
    h1 = scd.scd2_history(base_log, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    via_bcast = scd.scd2_apply(h1, batch, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx")
    via_shuffle = scd.scd2_apply(
        h1, batch, "url", "ts", PAY, op_col="op", tiebreak_col="row_idx",
        broadcast_keys_limit=0,
    )
    assert _hist_rows(via_bcast) == _hist_rows(via_shuffle)
