"""Incremental materialized-view maintenance (lake/ivm.py) and the
change feed's pre-image column (changes_between with_before=True).

The load-bearing invariant, checked against the REAL table feed and
against pure-DataFrame diffs: for any pre/post states,

    apply_changes_to_agg(compute_agg(pre), changes(pre->post))
        == compute_agg(post)

including group death (count -> 0) and SUM-over-no-values -> NULL.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Row, functions as F

from csv_cruncher_spark.cdc.fixtures import (
    ChangeLogSpec,
    generate_change_log,
    reference_fold,
)
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake import ivm
from csv_cruncher_spark.lake.table import LakeTable


def _mk_log(tmp_path, n_batches=3, seed=47):
    return generate_change_log(
        ChangeLogSpec(
            n_urls=80,
            n_batches=n_batches,
            events_per_batch=120,
            seed=seed,
            out_dir=str(tmp_path / "batches"),
        )
    )


def _agg_dict(df, count_col="n_rows"):
    return {
        tuple(r[c] for c in df.columns if c not in (count_col, "sum_len", "sum_len_nn")):
        (r[count_col], r["sum_len"])
        for r in df.collect()
    }


# ------------------------------------------------------------- table feed --


def test_feed_with_before_preimages(spark, tmp_path):
    """__before carries the key's resolved content at from_epoch: null
    for I, the old row for U and D; bootstrap (-1) is all-null."""
    paths = _mk_log(tmp_path, n_batches=3)
    p = str(tmp_path / "lake")
    CdcPipeline(p, n_buckets=4).run(spark, os.path.dirname(paths[0]))
    t = LakeTable.load(p)

    old = reference_fold(paths[:1])
    feed = t.changes_between(spark, 0, 2, with_before=True).collect()
    assert feed, "expected net changes across epochs (0, 2]"
    seen_ops = set()
    for r in feed:
        seen_ops.add(r["__op"])
        if r["__op"] == "I":
            assert r["__before"] is None, r
        else:
            b = r["__before"]
            assert b is not None and b["url"] == r["url"], r
            want = old[r["url"]]
            assert b["text"] == want["text"] and b["lang"] == want["lang"], r
            if r["__op"] == "D":
                assert r["text"] is None  # post payload stays nulled
    assert {"I", "U", "D"} & seen_ops, seen_ops

    boot = t.changes_between(spark, -1, with_before=True)
    assert boot.filter(F.col("__before").isNotNull()).count() == 0
    assert "__before" in boot.columns
    # empty range keeps the schema too
    assert "__before" in t.changes_between(spark, 1, 1, with_before=True).columns


def test_maintained_agg_tracks_table_epoch_by_epoch(spark, tmp_path):
    """Bootstrap the aggregate at epoch 0, then fold each epoch's feed in
    turn; after every fold the maintained aggregate equals a recompute
    over the table state at that epoch. Measure (text length) is derived
    via ivm.derive, so the pre-image derivation path is exercised."""
    paths = _mk_log(tmp_path, n_batches=4, seed=52)
    p = str(tmp_path / "lake")
    CdcPipeline(p, n_buckets=4).run(spark, os.path.dirname(paths[0]))
    t = LakeTable.load(p)

    group, sums = ["lang"], {"sum_len": "text_len"}

    def recompute(epoch):
        st = t.read(spark, snap=t.snapshot_at(epoch)).withColumn(
            "text_len", F.length("text").cast("long")
        )
        return ivm.compute_agg(st, group, sums)

    agg = recompute(0)
    for epoch in range(1, 4):
        feed = t.changes_between(
            spark, epoch - 1, epoch, with_before=True
        )
        feed = ivm.derive(
            feed, text_len=lambda c: F.length(c("text")).cast("long")
        )
        agg = ivm.apply_changes_to_agg(agg, feed, group, sums)
        assert _agg_dict(agg) == _agg_dict(recompute(epoch)), epoch


# -------------------------------------------------------- diff_states path --


def _state_df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, g=g, v=v) for k, g, v in rows],
        "k long, g string, v long",
    )


def test_diff_states_shape_and_preimages(spark):
    pre = _state_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", None)])
    post = _state_df(spark, [(2, "b", 25), (3, "b", None), (4, "c", 40)])
    got = {r["k"]: r for r in ivm.diff_states(pre, post, "k").collect()}
    assert set(got) == {1, 2, 4}  # key 3 net-unchanged -> suppressed
    assert got[1]["__op"] == "D" and got[1]["g"] is None
    assert got[1]["__before"]["v"] == 10
    assert got[2]["__op"] == "U" and got[2]["__before"]["g"] == "a"
    assert got[4]["__op"] == "I" and got[4]["__before"] is None


def test_randomized_maintenance_equals_recompute(spark):
    """Property over randomized pre/post states with nulls, group death,
    group birth, and group-preserving updates."""
    rng = random.Random(1234)
    groups = ["a", "b", "c", "d"]
    for trial in range(4):
        pre_rows = [
            (k, rng.choice(groups), rng.choice([None, rng.randrange(100)]))
            for k in range(60)
            if rng.random() < 0.7
        ]
        pre_keys = {r[0] for r in pre_rows}
        post_rows = [
            (k, rng.choice(groups), rng.choice([None, rng.randrange(100)]))
            for k in range(80)
            if rng.random() < 0.7 and (k in pre_keys or k >= 60 or rng.random() < 0.5)
        ]
        # force total eviction of group 'd' from post (group death path)
        post_rows = [r for r in post_rows if r[1] != "d"]
        pre, post = _state_df(spark, pre_rows), _state_df(spark, post_rows)
        changes = ivm.diff_states(pre, post, "k")
        maintained = ivm.apply_changes_to_agg(
            ivm.compute_agg(pre, ["g"], {"sum_len": "v"}),
            changes,
            ["g"],
            {"sum_len": "v"},
        )
        assert _agg_dict(maintained) == _agg_dict(
            ivm.compute_agg(post, ["g"], {"sum_len": "v"})
        ), trial


def test_sum_nulls_when_last_value_retracted(spark):
    """Retracting the only non-null measure must yield NULL (recompute
    parity), not 0 — and the nulled sum keeps folding correctly."""
    pre = _state_df(spark, [(1, "a", 7), (2, "a", None)])
    mid = _state_df(spark, [(1, "a", None), (2, "a", None)])
    post = _state_df(spark, [(1, "a", None), (2, "a", 3)])
    agg = ivm.compute_agg(pre, ["g"], {"sum_len": "v"})
    agg = ivm.apply_changes_to_agg(
        agg, ivm.diff_states(pre, mid, "k"), ["g"], {"sum_len": "v"}
    )
    row = agg.collect()[0]
    assert row["n_rows"] == 2 and row["sum_len"] is None
    agg = ivm.apply_changes_to_agg(
        agg, ivm.diff_states(mid, post, "k"), ["g"], {"sum_len": "v"}
    )
    row = agg.collect()[0]
    assert row["n_rows"] == 2 and row["sum_len"] == 3


def test_agg_delta_suppresses_untouched_groups(spark):
    """An update that changes neither the group nor any measure emits no
    delta row for that group (zero-delta suppression), so a keyed upsert
    of deltas touches only groups that moved."""
    pre = _state_df(spark, [(1, "a", 10), (2, "b", 20)])
    # key 1: payload change invisible to this aggregate (same g, same v)
    # -> must NOT appear; key 2: measure change -> must appear
    pre2 = pre.withColumn("extra", F.lit("x"))
    post2 = _state_df(spark, [(1, "a", 10), (2, "b", 21)]).withColumn(
        "extra", F.when(F.col("k") == 1, F.lit("y")).otherwise(F.lit("x"))
    )
    changes = ivm.diff_states(pre2, post2, "k")
    assert {r["k"] for r in changes.collect()} == {1, 2}
    delta = ivm.agg_delta(changes, ["g"], {"sum_len": "v"})
    rows = {r["g"]: r for r in delta.collect()}
    assert set(rows) == {"b"}
    assert rows["b"]["n_rows"] == 0 and rows["b"]["sum_len"] == 1


def test_apply_rejects_missing_maintained_columns(spark):
    import pytest

    pre = _state_df(spark, [(1, "a", 1)])
    bad = pre.groupBy("g").agg(F.count(F.lit(1)).alias("n_rows"))
    with pytest.raises(ValueError, match="compute_agg"):
        ivm.apply_changes_to_agg(
            bad, ivm.diff_states(pre, pre, "k"), ["g"], {"sum_len": "v"}
        )


# ------------------------------------------------- maintained aggregate --


def _mv(tmp_path, group=("lang",)):
    return ivm.MaintainedAggregate(
        str(tmp_path / "lake"),
        str(tmp_path / "mv"),
        list(group),
        {"sum_len": "text_len"},
        count_col="n_pages",
        derives={"text_len": lambda c: F.length(c("text"))},
    )


def test_maintained_aggregate_follows_table(spark, tmp_path):
    """bootstrap on a prefix of the change log, then refresh after more
    batches land: the stored aggregate must equal a full recompute at
    every step, and a refresh with nothing new is a no-op."""
    paths = _mk_log(tmp_path, n_batches=4)
    bdir = os.path.dirname(paths[0])
    p = str(tmp_path / "lake")
    pipe = CdcPipeline(p, n_buckets=4)
    first_two = "|".join(os.path.basename(x) for x in paths[:2])
    pipe.run(spark, bdir, include=f".*/({first_two})")

    mv = _mv(tmp_path)
    e1 = mv.refresh(spark)  # first refresh bootstraps

    def recompute():
        t = LakeTable.load(p)
        st = t.read(spark).withColumn("text_len", F.length("text"))
        return ivm.compute_agg(st, ["lang"], {"sum_len": "text_len"}, count_col="n_pages")

    got1 = _agg_dict(mv.read(spark), "n_pages")
    assert got1 and got1 == _agg_dict(recompute(), "n_pages")  # non-vacuous

    # two more batches land; one refresh folds BOTH epochs
    pipe.run(spark, bdir)
    e2 = mv.refresh(spark)
    assert e2 > e1
    assert _agg_dict(mv.read(spark), "n_pages") == _agg_dict(recompute(), "n_pages")

    # idempotent: nothing new -> same epoch, state file unchanged
    st_before = mv.state()
    assert mv.refresh(spark) == e2
    assert mv.state() == st_before


def test_maintained_aggregate_store_pruned_and_readable(spark, tmp_path):
    paths = _mk_log(tmp_path, n_batches=3, seed=11)
    bdir = os.path.dirname(paths[0])
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4)
    mv = _mv(tmp_path)
    for i in (1, 2, 3):
        upto = "|".join(os.path.basename(x) for x in paths[:i])
        pipe.run(spark, bdir, include=f".*/({upto})")
        mv.refresh(spark)
    dirs = [
        d for d in os.listdir(tmp_path / "mv") if d.startswith("agg-")
    ]
    assert len(dirs) <= 2  # current + previous only
    assert mv.read(spark).count() > 0


def test_maintained_aggregate_read_before_refresh_raises(spark, tmp_path):
    import pytest

    mv = _mv(tmp_path)
    with pytest.raises(ValueError, match="refresh"):
        mv.read(spark)


# ------------------------------------------------- MIN/MAX maintenance --


def _mm_dict(df):
    return {
        r.g: (r.n_rows, r.min_v, r.max_v) for r in df.collect()
    }


def _mm(pre, post, poisoned_state=None):
    changes = ivm.diff_states(pre, post, "k")
    return ivm.apply_changes_to_minmax(
        ivm.compute_minmax(pre, ["g"], mins={"min_v": "v"}, maxs={"max_v": "v"}),
        changes,
        poisoned_state if poisoned_state is not None else post,
        ["g"],
        mins={"min_v": "v"},
        maxs={"max_v": "v"},
    )


def test_minmax_maintenance_equals_recompute_randomized(spark):
    """Property: maintained MIN/MAX == recompute for randomized pre/post
    with nulls, births, deaths, group moves, and extremum deletions."""
    rng = random.Random(4321)
    groups = ["a", "b", "c", "d"]
    for trial in range(4):
        pre_rows = [
            (k, rng.choice(groups), rng.choice([None, rng.randrange(100)]))
            for k in range(60)
            if rng.random() < 0.7
        ]
        pre_keys = {r[0] for r in pre_rows}
        post_rows = [
            (k, rng.choice(groups), rng.choice([None, rng.randrange(100)]))
            for k in range(80)
            if rng.random() < 0.7 and (k in pre_keys or k >= 60 or rng.random() < 0.5)
        ]
        post_rows = [r for r in post_rows if r[1] != "d"]  # group death
        pre, post = _state_df(spark, pre_rows), _state_df(spark, post_rows)
        maintained = _mm(pre, post)
        expected = ivm.compute_minmax(
            post, ["g"], mins={"min_v": "v"}, maxs={"max_v": "v"}
        )
        assert _mm_dict(maintained) == _mm_dict(expected), trial


def test_minmax_extremum_deletion_rescans_group(spark):
    pre = _state_df(spark, [(1, "a", 5), (2, "a", 50), (3, "a", 20)])
    post = _state_df(spark, [(2, "a", 50), (3, "a", 20)])  # min row deleted
    out = _mm_dict(_mm(pre, post))
    assert out == {"a": (2, 20, 50)}


def test_minmax_all_null_survivors_give_null(spark):
    pre = _state_df(spark, [(1, "a", 7), (2, "a", None)])
    post = _state_df(spark, [(2, "a", None)])
    out = _mm_dict(_mm(pre, post))
    assert out == {"a": (1, None, None)}


def test_minmax_insert_only_never_consults_state(spark):
    """Insertions (and non-extremum deletions) are self-maintainable:
    a POISONED state frame proves the rescan path stayed cold."""
    pre = _state_df(spark, [(1, "a", 10), (2, "a", 30)])
    # delete the NON-extremum? 30 is the max -> endangers. Use a middle
    # value instead: insert only + delete nothing.
    post = _state_df(
        spark, [(1, "a", 10), (2, "a", 30), (4, "a", 20), (5, "b", 1)]
    )
    poisoned = _state_df(spark, [(9, "a", -999), (10, "b", 999)])
    out = _mm_dict(_mm(pre, post, poisoned_state=poisoned))
    assert out == {"a": (3, 10, 30), "b": (1, 1, 1)}


def test_minmax_mid_value_deletion_stays_incremental(spark):
    """Deleting a strictly-interior value endangers nothing — the
    poisoned state proves no rescan fired."""
    pre = _state_df(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)])
    post = _state_df(spark, [(1, "a", 10), (3, "a", 30)])
    poisoned = _state_df(spark, [(9, "a", -999)])
    out = _mm_dict(_mm(pre, post, poisoned_state=poisoned))
    assert out == {"a": (2, 10, 30)}


def test_minmax_validates_inputs(spark):
    import pytest

    pre = _state_df(spark, [(1, "a", 1)])
    with pytest.raises(ValueError):
        ivm.compute_minmax(pre, ["g"])
    agg = ivm.compute_minmax(pre, ["g"], mins={"min_v": "v"})
    with pytest.raises(ValueError):
        ivm.apply_changes_to_minmax(
            agg, ivm.diff_states(pre, pre, "k"), pre, ["g"],
            mins={"other": "v"},
        )
    with pytest.raises(ValueError):
        ivm.apply_changes_to_minmax(
            agg, ivm.diff_states(pre, pre, "k"), pre, ["g"],
            mins={"min_v": "v"}, maxs={"min_v": "v"},
        )


def test_maintained_extrema_follows_table(spark, tmp_path):
    """Durable MIN/MAX view: bootstrap on a prefix, refresh after more
    batches (deletes included in the fixture log, so endangered rescans
    fire) — stored extrema must equal a recompute at every step and the
    no-op refresh is idempotent."""
    paths = _mk_log(tmp_path, n_batches=4, seed=23)
    bdir = os.path.dirname(paths[0])
    p = str(tmp_path / "lake")
    pipe = CdcPipeline(p, n_buckets=4)
    first_two = "|".join(os.path.basename(x) for x in paths[:2])
    pipe.run(spark, bdir, include=f".*/({first_two})")

    from csv_cruncher_spark.lake import MaintainedExtrema

    mv = MaintainedExtrema(
        p,
        str(tmp_path / "mmx"),
        ["lang"],
        mins={"min_len": "text_len"},
        maxs={"max_len": "text_len"},
        count_col="n_pages",
        derives={"text_len": lambda c: F.length(c("text"))},
    )
    e1 = mv.refresh(spark)

    def recompute():
        st = LakeTable.load(p).read(spark).withColumn(
            "text_len", F.length("text")
        )
        return ivm.compute_minmax(
            st, ["lang"], mins={"min_len": "text_len"},
            maxs={"max_len": "text_len"}, count_col="n_pages",
        )

    def as_dict(df):
        return {r.lang: (r.n_pages, r.min_len, r.max_len) for r in df.collect()}

    got1 = as_dict(mv.read(spark))
    assert got1 and got1 == as_dict(recompute())

    pipe.run(spark, bdir)
    e2 = mv.refresh(spark)
    assert e2 > e1
    assert as_dict(mv.read(spark)) == as_dict(recompute())

    st_before = mv.state()
    assert mv.refresh(spark) == e2
    assert mv.state() == st_before


def test_maintained_extrema_requires_measures(tmp_path):
    import pytest

    from csv_cruncher_spark.lake import MaintainedExtrema

    with pytest.raises(ValueError):
        MaintainedExtrema("t", str(tmp_path / "x"), ["g"])
