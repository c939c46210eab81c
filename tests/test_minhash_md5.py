"""Cross-engine-exact MinHash (dedup.minhash_md5_signatures /
minhash_md5_pairs): the md5-hex-min signature must equal an independent
pure-Python hashlib fold bit-for-bit, and the banded pair pipeline must
behave like its xxhash64 production twin (same candidate semantics,
capped buckets, exact-binary est_jaccard)."""

import hashlib

from pyspark.sql import Row

from csv_cruncher_spark.operators import dedup


def _py_shingles(text: str, k: int = 3) -> list[str]:
    """Twin of dedup.shingles: word k-grams; short docs yield the slice
    from position 1 (greatest(n-k+1, 1) positions, slice semantics)."""
    words = text.split(" ")
    n = max(len(words) - (k - 1), 1)
    return [" ".join(words[i : i + k]) for i in range(n)]


def _py_signature(text: str, n_hashes: int = 16, k: int = 3) -> list[str]:
    sh = _py_shingles(text, k)
    return [
        min(
            hashlib.md5(f"{s}:mh{i}".encode()).hexdigest()[:8] for s in sh
        )
        for i in range(n_hashes)
    ]


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river side"),
    (3, "completely different text with no shared shingles at all here"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5, "ab"),  # single-shingle short doc (greatest(...,1) path)
]


def test_md5_signatures_match_pure_python(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    got = {
        r["id"]: [r[f"mh{i}"] for i in range(16)]
        for r in dedup.minhash_md5_signatures(df, "doc_id", "text").collect()
    }
    for i, t in DOCS:
        assert got[i] == _py_signature(t), f"doc {i}"


def test_md5_pairs_semantics(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    out = dedup.minhash_md5_pairs(df, "doc_id", "text")
    rows = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}
    dedup.release(out)
    # identical docs: every minimum matches
    assert rows[(1, 4)] == 1.0
    # near-identical docs: high but not full agreement, exact binary k/16
    assert (1, 2) in rows and 0.5 <= rows[(1, 2)] < 1.0
    assert rows[(1, 2)] * 16 == int(rows[(1, 2)] * 16)
    # the unrelated doc pairs with nothing
    assert not any(3 in p for p in rows)
    # ordering contract
    assert all(a < b for a, b in rows)


def test_md5_pairs_bucket_cap_drops_degenerate_band(spark):
    """50 identical docs blow past max_bucket → their band buckets are
    dropped (bounded join) and surfaced in the audit frame."""
    many = [Row(doc_id=i, text="same text everywhere in this tiny doc") for i in range(50)]
    df = spark.createDataFrame(many)
    out = dedup.minhash_md5_pairs(df, "doc_id", "text", max_bucket=10)
    assert out.count() == 0
    dropped = dedup.dropped_buckets(out)
    assert dropped is not None and dropped.count() > 0
    dedup.release(out)
