"""MaintainedCorpus (lake/corpus_view.py): the incrementally-maintained
selected corpus must EQUAL a from-scratch build_corpus over the table
state after every refresh — including keeper succession when the
current keeper of a fingerprint group is deleted — while rewriting only
the buckets the feed touches."""

import base64
import csv
import os

from pyspark.sql import functions as F

from csv_cruncher_spark.cdc.fixtures import _ts_str
from csv_cruncher_spark.cdc.pipeline import CdcPipeline
from csv_cruncher_spark.lake.corpus_view import MaintainedCorpus
from csv_cruncher_spark.lake.table import LakeTable
from csv_cruncher_spark.operators import corpus

CFG = dict(min_tokens=3, quotas={"en": 0.9}, default_quota=0.8,
           splits={"train": 8.0, "val": 1.0, "test": 1.0})


def _html(text: str) -> str:
    return base64.b64encode(
        f"<html><body><p>{text}</p></body></html>".encode()
    ).decode("ascii")


def _write_batch(dirpath: str, seq: int, rows: list[tuple[str, str, int, str, str]]):
    """rows: (op, url, ts_s, text, lang); html derived from text so two
    urls given the same text share a fingerprint."""
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"batch-{seq:05d}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "url", "warc_ts", "html", "lang"])
        w.writeheader()
        for op, url, ts_s, text, lang in rows:
            w.writerow({
                "op": op, "url": url, "warc_ts": _ts_str(ts_s),
                "html": "" if op == "D" else _html(text),
                "lang": "" if op == "D" else lang,
            })
    return path


T0 = 1_704_067_200
DOC = "alpha beta gamma delta epsilon zeta eta theta"
SHORT = "too short"  # 2 tokens: fails the min_tokens=3 gate


def _expected(spark, table_path):
    pages = LakeTable.load(table_path).read(spark)
    return {
        (r["url"], r["lang"], r["split"])
        for r in corpus.build_corpus(pages, "url", "text", "lang", **CFG)
        .select("url", "lang", "split").collect()
    }


def _got(spark, mc):
    return {
        (r["url"], r["lang"], r["split"]) for r in mc.read(spark).collect()
    }


def test_maintained_corpus_follows_table(spark, tmp_path):
    batches = str(tmp_path / "batches")
    table = str(tmp_path / "lake")
    store = str(tmp_path / "corpus_store")
    # batch 0: u1/u2 share a fingerprint (u1 keeper), u3 unique, u4 gated out
    _write_batch(batches, 0, [
        ("I", "https://a.example/1", T0 + 10, DOC + " one", "en"),
        ("I", "https://a.example/2a", T0 + 11, DOC + " one", "en"),
        ("I", "https://b.example/3", T0 + 12, DOC + " three", "de"),
        ("I", "https://b.example/4", T0 + 13, SHORT, "en"),
    ])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    mc = MaintainedCorpus(table, store, n_buckets=8, **CFG)
    assert mc.refresh(spark) == LakeTable.load(table).snapshot()["epoch_id"]
    assert _got(spark, mc) == _expected(spark, table)

    # batch 1: DELETE the keeper u1 -> u2 must be promoted; add u5
    _write_batch(batches, 1, [
        ("D", "https://a.example/1", T0 + 3600, "", ""),
        ("I", "https://c.example/5", T0 + 3601, DOC + " five", "fr"),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    got = _got(spark, mc)
    assert got == _expected(spark, table)
    assert any(u == "https://a.example/2a" for (u, _, _) in got), (
        "keeper succession: the surviving twin must be promoted"
    )

    # batch 2: UPDATE u3's text (fingerprint moves groups), u5 text now
    # collides with u2's group -> u5 loses election (u2 < u5 is false...
    # election is min url, 'https://a.example/2a' < 'https://c.example/5')
    _write_batch(batches, 2, [
        ("U", "https://b.example/3", T0 + 7200, DOC + " three changed", "de"),
        ("U", "https://c.example/5", T0 + 7201, DOC + " one", "fr"),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    assert _got(spark, mc) == _expected(spark, table)


def test_refresh_idempotent_and_bucket_scoped(spark, tmp_path):
    batches = str(tmp_path / "b2")
    table = str(tmp_path / "lake2")
    store = str(tmp_path / "store2")
    _write_batch(batches, 0, [
        ("I", f"https://d.example/{i}", T0 + i, DOC + f" v{i}", "en")
        for i in range(12)
    ])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    mc = MaintainedCorpus(table, store, n_buckets=8, **CFG)
    e1 = mc.refresh(spark)
    st1 = mc.state()
    # no new epochs -> no-op, state file pointer map unchanged
    assert mc.refresh(spark) == e1
    assert mc.state() == st1

    # one changed url -> only the buckets of its old/new fingerprint move
    _write_batch(batches, 1, [
        ("U", "https://d.example/3", T0 + 9000, DOC + " v3 edited", "en"),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    st2 = mc.state()
    moved = {b for b in st1["buckets"]
             if st2["buckets"].get(b) != st1["buckets"][b]}
    untouched = {b for b in st1["buckets"]
                 if st2["buckets"].get(b) == st1["buckets"][b]}
    assert 1 <= len(moved) <= 2, (st1["buckets"], st2["buckets"])
    assert untouched, "unaffected buckets must keep their old data paths"
    assert _got(spark, mc) == _expected(spark, table)


BASE16 = ("alpha beta gamma delta epsilon zeta eta theta "
          "iota kappa lambda mu nu xi omicron pi")
NEAR16 = BASE16.replace("theta", "CHANGED")  # 1 of 16 tokens differs:
# shingle Jaccard ≈ 11/17 ≈ 0.65 — near-dup at the 0.5 threshold, but a
# DIFFERENT fingerprint (so not the keeper election's case)
OTHER = "one two three four five six seven eight nine ten eleven twelve"


def test_near_dup_change_screened_at_refresh(spark, tmp_path):
    """Round-4 verdict #6: a near-duplicate arriving through the change
    feed must be rejected at refresh — the batch build_corpus(near_dup=)
    collapse is no longer the only guard. Exact-fp duplicates stay
    members (keeper succession intact); in-batch near-dups keep the
    smaller url; genuinely novel docs are admitted."""
    batches = str(tmp_path / "b4")
    table = str(tmp_path / "lake4")
    store = str(tmp_path / "store4")
    _write_batch(batches, 0, [
        ("I", "https://n.example/base", T0 + 1, BASE16, "en"),
        ("I", "https://n.example/other", T0 + 2, OTHER, "en"),
    ])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    mc = MaintainedCorpus(table, store, n_buckets=8, near_dup=True,
                          min_tokens=3, default_quota=1.0)
    mc.refresh(spark)
    assert {u for (u, _, _) in _got(spark, mc)} == {
        "https://n.example/base", "https://n.example/other"
    }

    # batch 1: one near-dup of /base (rejected), one exact dup of /base
    # (admitted as member, loses election), one novel doc (admitted),
    # and an in-batch near-dup pair (smaller url wins)
    _write_batch(batches, 1, [
        ("I", "https://x.example/near", T0 + 100, NEAR16, "en"),
        ("I", "https://x.example/exact", T0 + 101, BASE16, "en"),
        ("I", "https://x.example/novel", T0 + 102,
         "red orange yellow green blue indigo violet colors rainbow", "en"),
        ("I", "https://y.example/pair-a", T0 + 103,
         "sun moon stars comet nebula galaxy quasar pulsar meteor asteroid planet dust", "en"),
        ("I", "https://y.example/pair-b", T0 + 104,
         "sun moon stars comet nebula galaxy quasar pulsar meteor asteroid planet CHANGED", "en"),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    urls = {u for (u, _, _) in _got(spark, mc)}
    assert "https://x.example/near" not in urls, "cross-fp near-dup must be screened"
    assert "https://x.example/novel" in urls
    assert "https://y.example/pair-a" in urls
    assert "https://y.example/pair-b" not in urls, "in-batch near-dup: smaller url wins"
    # exact dup entered the store (non-keeper), so /base still keeps
    assert "https://n.example/base" in urls and "https://x.example/exact" not in urls

    # batch 2: delete the keeper of the exact-fp group -> succession to
    # the exact twin (which near-dup screening deliberately exempted)
    _write_batch(batches, 2, [
        ("D", "https://n.example/base", T0 + 200, "", ""),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    urls = {u for (u, _, _) in _got(spark, mc)}
    assert "https://x.example/exact" in urls, "same-fp twin must be promoted"
    assert "https://n.example/base" not in urls
    # documented limitation: /near does NOT resurrect (it was never stored)
    assert "https://x.example/near" not in urls

    # a FRESH handle with no near_dup args adopts the stored config
    mc2 = MaintainedCorpus(table, store, n_buckets=8, min_tokens=3, default_quota=1.0)
    _write_batch(batches, 3, [
        ("I", "https://z.example/near2", T0 + 300,
         OTHER.replace("seven", "CHANGED"), "en"),
    ])
    pipe.run(spark, batches)
    mc2.refresh(spark)
    assert mc2.near_dup is True
    assert "https://z.example/near2" not in {u for (u, _, _) in _got(spark, mc2)}


def test_near_dup_chain_collapses_to_one_member(spark, tmp_path):
    """A~B, B~C with A≁C (urls A<B<C, all in one batch): both B and C
    are rejected — one member per chain, matching build_corpus's
    connected-component collapse (documented contract in
    _in_batch_rejects)."""
    base = ("sun moon stars comet nebula galaxy quasar pulsar meteor "
            "asteroid planet dust cloud ring orbit core")
    # one-token steps: J(A,B) ≈ J(B,C) ≈ 0.65 (near-dups), J(A,C) ≈ 0.4
    mid = base.replace("comet", "X1")
    far = mid.replace("ring", "Y1")
    batches = str(tmp_path / "b6")
    table = str(tmp_path / "lake6")
    store = str(tmp_path / "store6")
    _write_batch(batches, 0, [("I", "https://seed.example/1", T0 + 1, OTHER, "en")])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    mc = MaintainedCorpus(table, store, n_buckets=8, near_dup=True,
                          min_tokens=3, default_quota=1.0)
    mc.refresh(spark)
    _write_batch(batches, 1, [
        ("I", "https://chain.example/a", T0 + 10, base, "en"),
        ("I", "https://chain.example/b", T0 + 11, mid, "en"),
        ("I", "https://chain.example/c", T0 + 12, far, "en"),
    ])
    pipe.run(spark, batches)
    mc.refresh(spark)
    urls = {u for (u, _, _) in _got(spark, mc)}
    assert "https://chain.example/a" in urls
    assert "https://chain.example/b" not in urls
    assert "https://chain.example/c" not in urls


def test_near_dup_requires_bootstrap_with_signatures(spark, tmp_path):
    import pytest

    batches = str(tmp_path / "b5")
    table = str(tmp_path / "lake5")
    store = str(tmp_path / "store5")
    _write_batch(batches, 0, [("I", "https://q.example/1", T0 + 1, BASE16, "en")])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    MaintainedCorpus(table, store, n_buckets=8, **CFG).refresh(spark)
    _write_batch(batches, 1, [("I", "https://q.example/2", T0 + 2, OTHER, "en")])
    pipe.run(spark, batches)
    with pytest.raises(ValueError, match="re-bootstrap"):
        MaintainedCorpus(table, store, n_buckets=8, near_dup=True, **CFG).refresh(spark)


def test_bootstrap_after_many_epochs_equals_refresh_path(spark, tmp_path):
    """A fresh bootstrap at epoch N and a refresh-maintained store that
    followed epochs 0..N must read identically."""
    batches = str(tmp_path / "b3")
    table = str(tmp_path / "lake3")
    _write_batch(batches, 0, [
        ("I", f"https://e.example/{i}", T0 + i, DOC + f" w{i % 5}", "en")
        for i in range(10)
    ])
    pipe = CdcPipeline(table, n_buckets=4)
    pipe.run(spark, batches)
    mc_inc = MaintainedCorpus(table, str(tmp_path / "inc"), n_buckets=8, **CFG)
    mc_inc.refresh(spark)
    _write_batch(batches, 1, [
        ("D", "https://e.example/0", T0 + 5000, "", ""),
        ("I", "https://e.example/99", T0 + 5001, DOC + " w99", "de"),
    ])
    pipe.run(spark, batches)
    mc_inc.refresh(spark)
    mc_full = MaintainedCorpus(table, str(tmp_path / "full"), n_buckets=8, **CFG)
    mc_full.bootstrap(spark)
    assert _got(spark, mc_inc) == _got(spark, mc_full) == _expected(spark, table)
