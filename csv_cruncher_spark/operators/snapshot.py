"""Crawl-snapshot diffing and CDC change-batch generation — the FRONT
of the north-rule ingest loop.

The CDC engine (lake/merge.py, cdc/pipeline.py) consumes op-coded
change batches (op ∈ {I,U,D}, url, warc_ts, payload...) — the shape of
a DMS stream or the reference's own test corpus
(it/OptionsCombinationsTest.kt:232-233). But a web-scale pipeline often
does NOT receive a change stream: it receives whole crawl SNAPSHOTS
(this month's Common Crawl vs last month's), and the change batch has
to be derived. This module closes that loop: ``snapshot_diff``
classifies every url across two snapshots (added / changed / unchanged
/ deleted) and ``snapshot_to_changes`` emits the op-coded batch whose
application to a table holding the old snapshot reproduces the new one
exactly — the round-trip invariant ``apply(diff(old, new), old) == new``
that tests/test_snapshot.py pins through the REAL pipeline.

Scale shape (the part that must survive 100 TB):
- the diff itself never shuffles payload. Both snapshots project to a
  narrow (key, fingerprint) frame — the fingerprint is one md5 over the
  compared columns, computed scan-side — and the FULL OUTER equi-join
  carries exactly those two columns per side. With both snapshots
  bucketed by url (the lake layout) the join is exchange-free.
- payload rides only for rows that actually changed: upsert payload is
  recovered by ONE equi-join of the (small) changed-key set against the
  new snapshot; deletes carry no payload at all. A 99%-unchanged
  monthly recrawl costs two narrow scans + a 1%-sized payload join.
- fingerprints are md5 over NULL-marked concatenation (portable,
  cross-engine exact — the ``minhash_md5_signatures`` discipline,
  operators/dedup.py:291), so the DuckDB oracle replays the whole
  classification bit-for-bit.

Provenance: the reference engine has no snapshot differ — it re-imports
full tables per run (Cruncher.kt:59). This derives the change stream
the rest of the lake layer consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "snapshot_fingerprint",
    "snapshot_diff",
    "snapshot_to_changes",
    "text_reuse_report",
    "url_churn_report",
]

# a concat separator / NULL marker that cannot collide with real text:
# \x01 is stripped by the html extractor and never appears in urls
_SEP = "\x01"
_NULL = "\x01\x02"


def snapshot_fingerprint(df: DataFrame, key_col: str, compare_cols: list[str]) -> DataFrame:
    """Narrow (key, fp) projection of one snapshot: fp = md5 over the
    compared columns with an unambiguous separator and NULL marker
    (concat_ws would silently skip NULLs, colliding ('a', NULL) with
    ('a',) — the marker keeps the encoding injective). Purely scan-side;
    Catalyst prunes every other column off the parquet read."""
    parts = []
    for c in compare_cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
        parts.append(F.lit(_SEP))
    return df.select(
        F.col(key_col).alias("__key"),
        F.md5(F.concat(*parts[:-1])).alias("__fp"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns (``key_col``, status, fp_old, fp_new) with status ∈
    {'added', 'changed', 'unchanged', 'deleted'}. ``compare_cols``
    defaults to every shared non-key column (order-normalized so the
    two snapshots' column order cannot desync the fingerprint).

    Plan: two narrow (key, fp) scans, one full-outer equi-join on the
    key — no payload column ever enters the exchange."""
    cols = _compare_cols(old, new, key_col, compare_cols)
    o = snapshot_fingerprint(old, key_col, cols).alias("o")
    n = snapshot_fingerprint(new, key_col, cols).alias("n")
    joined = o.join(n, F.col("o.__key") == F.col("n.__key"), "full_outer")
    status = (
        F.when(F.col("o.__fp").isNull(), F.lit("added"))
        .when(F.col("n.__fp").isNull(), F.lit("deleted"))
        .when(F.col("o.__fp") == F.col("n.__fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col("o.__key"), F.col("n.__key")).alias(key_col),
        status.alias("status"),
        F.col("o.__fp").alias("fp_old"),
        F.col("n.__fp").alias("fp_new"),
    )


def _compare_cols(
    old: DataFrame, new: DataFrame, key_col: str, compare_cols: list[str] | None
) -> list[str]:
    if compare_cols is not None:
        missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
        if missing:
            raise ValueError(f"compare columns absent from a snapshot: {missing}")
        return list(compare_cols)
    shared = sorted((set(old.columns) & set(new.columns)) - {key_col})
    if not shared:
        raise ValueError("snapshots share no non-key columns to compare")
    return shared


def snapshot_to_changes(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    delete_ts: int | str | None = None,
    ts_col: str = "warc_ts",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Derive the op-coded change batch that carries a table from
    ``old`` to ``new``: added keys emit I with the new payload, changed
    keys emit U with the new payload, deleted keys emit D with the key
    and ``delete_ts`` only (every other column a typed NULL — the
    pipeline's D handling never reads payload).

    ``delete_ts`` is REQUIRED when any key can disappear: a delete event
    needs a timestamp strictly newer than the departed row's or LWW
    would resurrect it, and only the caller knows the new crawl's cut
    time (deriving it from max(new.ts) would put a driver-side global
    agg in every diff and still be wrong for an empty new snapshot).

    Output columns: op, ``key_col``, then every ``new`` payload column
    in snapshot order. The round-trip invariant — bootstrapping a lake
    table at ``old`` and applying this batch yields exactly ``new`` —
    is pinned through the real pipeline in tests/test_snapshot.py.
    """
    cols = _compare_cols(old, new, key_col, compare_cols)
    d = snapshot_diff(old, new, key_col, cols)
    payload_cols = [c for c in new.columns if c != key_col]
    upsert_keys = d.filter(F.col("status").isin("added", "changed")).select(
        F.col(key_col),
        F.when(F.col("status") == "added", F.lit("I")).otherwise(F.lit("U")).alias("op"),
    )
    # ONE equi-join recovers payload for exactly the changed/added keys;
    # the unchanged bulk of the snapshot never leaves its scan
    upserts = upsert_keys.join(new, key_col).select("op", key_col, *payload_cols)
    deleted = d.filter(F.col("status") == "deleted")
    if delete_ts is None:
        # fail fast only when deletes actually exist would be a lazy
        # surprise at scale; demand the cut time up front instead
        raise ValueError(
            "delete_ts is required: delete events need a timestamp newer "
            "than the departed rows (the new crawl's cut time)"
        )
    del_sel = [F.lit("D").alias("op"), F.col(key_col)]
    for c in payload_cols:
        if c == ts_col:
            del_sel.append(F.lit(delete_ts).cast(dict(new.dtypes)[ts_col]).alias(c))
        else:
            del_sel.append(F.lit(None).cast(dict(new.dtypes)[c]).alias(c))
    deletes = deleted.select(*del_sel)
    return upserts.unionByName(deletes)


def text_reuse_report(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Cross-snapshot text-reuse: for every document of the NEW
    snapshot, the fraction of its distinct word ``k``-shingles that
    already occur ANYWHERE in the OLD snapshot — the "how much of this
    crawl is copied text" curation diagnostic (same-url recrawls,
    cross-url mirroring, template spread). `snapshot_diff` sees only
    per-key byte changes; this sees corpus-level reuse regardless of
    which url carries the text.

    Plan shape (100 TB): both sides reduce to DISTINCT shingle frames —
    the old corpus to ONE global distinct-shingle set (narrow, one
    string column), the new corpus to (key, shingle) distinct pairs;
    reuse is a LEFT SEMI equi-join (old side never carries payload,
    new side carries only the key) followed by two partial-combined
    counts per key. No windows, no Python, no payload in any exchange.
    NULL-text docs keep their row with n_shingles = 0 and NULL ratio
    (the novelty_scores discipline).

    Returns (key_col, n_shingles, n_reused, reuse_ratio[6dp]) — fully
    DuckDB-oracle-able (exact integer counts, one ROUND).
    """
    from .dedup import shingles

    new_sh = (
        new.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(F.col(key_col), F.explode(shingles(text_col, k)).alias("sh"))
        .distinct()
    )
    old_sh = (
        old.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(F.explode(shingles(text_col, k)).alias("sh"))
        .distinct()
    )
    reused = new_sh.join(old_sh, "sh", "left_semi")
    totals = new_sh.groupBy(key_col).agg(F.count("*").alias("n_shingles"))
    hits = reused.groupBy(key_col).agg(F.count("*").alias("n_reused"))
    base = new.select(key_col).distinct()
    return (
        base.join(totals, key_col, "left")
        .join(hits, key_col, "left")
        .withColumn("n_shingles", F.coalesce("n_shingles", F.lit(0)))
        .withColumn(
            "n_reused",
            F.when(F.col("n_shingles") > 0, F.coalesce("n_reused", F.lit(0))),
        )
        .withColumn(
            "reuse_ratio",
            F.round(F.col("n_reused") / F.col("n_shingles"), 6),
        )
    )


def url_churn_report(
    old: DataFrame,
    new: DataFrame,
    host_col: str,
    url_col: str,
) -> DataFrame:
    """Host-level URL churn between two crawl snapshots — the crawl-
    budget companion of :func:`snapshot_diff` (which diffs CONTENT per
    url; this diffs the URL SPACE per host): a host whose URL set turns
    over completely every crawl is a feed/archive/trap candidate and a
    recrawl-frequency signal, while a static URL set shifts budget to
    content-change detection (`crawl.change_rate_estimates`).

    One row per host appearing in either snapshot (NULL-url rows carry
    no key and drop; a NULL host forms its own row):

      host
      n_old, n_new         distinct URLs in each snapshot
      n_added              in new only
      n_removed            in old only
      n_kept               in both
      churn_micro          floor(1e6 * (n_added + n_removed) /
                           (n_kept + n_added + n_removed)) — 0 for a
                           frozen URL space, 1e6 for full turnover

    Scale shape: NO join at all — both snapshots reduce to distinct
    narrow (host, url) frames tagged 1/2, one union, one (host, url)
    aggregation folds the tags (1=removed, 2=added, 3=kept), and one
    host aggregation rolls counts up. Two map-combined exchanges on
    keys that cannot concentrate payloads; the classic full-outer-join
    formulation (which the oracle deliberately uses) would shuffle both
    snapshots into a join for the same answer.
    """
    def tagged(df: DataFrame, tag: int) -> DataFrame:
        return (
            df.filter(F.col(url_col).isNotNull())
            .select(
                F.col(host_col).alias("host"), F.col(url_col).alias("url")
            )
            .distinct()
            .withColumn("__tag", F.lit(tag))
        )

    status = (
        tagged(old, 1)
        .unionByName(tagged(new, 2))
        .groupBy("host", "url")
        .agg(F.sum("__tag").alias("__s"))
    )
    per_host = status.groupBy("host").agg(
        F.count(F.when(F.col("__s") == 1, 1)).alias("n_removed"),
        F.count(F.when(F.col("__s") == 2, 1)).alias("n_added"),
        F.count(F.when(F.col("__s") == 3, 1)).alias("n_kept"),
    )
    return per_host.select(
        "host",
        (F.col("n_removed") + F.col("n_kept")).alias("n_old"),
        (F.col("n_added") + F.col("n_kept")).alias("n_new"),
        "n_added",
        "n_removed",
        "n_kept",
        F.floor(
            (F.col("n_added") + F.col("n_removed"))
            * F.lit(1_000_000)
            / (F.col("n_kept") + F.col("n_added") + F.col("n_removed"))
        ).cast("bigint").alias("churn_micro"),
    )
