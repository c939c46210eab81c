"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator surface from SURVEY.md §2 +
the training-data-pipeline operators; ``oracle_sql()`` gives the DuckDB
twin for every SQL-expressible one. Column names/aliases match exactly on
both sides (the driver hash-compares values per sorted column name).

Determinism rules used throughout:
- every LIMIT has a full deterministic ORDER BY (unique-key tiebreak);
- float aggregates are rounded (2dp money, 6dp ratios) on BOTH sides so
  engine-order summation drift cannot flip the value hash;
- timestamps are exported as epoch seconds/microseconds (bigint), never as
  raw timestamp columns (tz-conversion-free).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csv_cruncher_spark.functions import json_subtree  # noqa: E402
from csv_cruncher_spark.functions import normalize_url, url_domain, url_host  # noqa: E402
from csv_cruncher_spark.lake import ivm, salt  # noqa: E402
from csv_cruncher_spark.operators import (  # noqa: E402
    bloom,
    boilerplate,
    c4,
    corpus,
    decontam,
    dedup,
    multimodal,
    packing,
    recall,
    sampling,
    semdedup,
    similarity,
    textstats,
    urlfilter,
)
from csv_cruncher_spark.operators.joins import interval_join  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _utc(spark: SparkSession) -> None:
    """Pin the session timezone for queries that convert naive (NTZ)
    timestamps to epochs: Spark's unix_timestamp/unix_micros interpret
    NTZ in the SESSION timezone while the DuckDB oracle's epoch() treats
    naive as UTC — without this, a non-UTC driver session would shift
    every epoch value."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# deterministic 64-dim probe vector for similarity queries
_QUERY_VEC = [0.125] * 64
_QUERY_VEC_SQL = "[" + ", ".join("0.125" for _ in range(64)) + "]::DOUBLE[]"


# ---------------------------------------------------------------- queries --


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + partial/final hash agg (SURVEY.md §2.C
    aggregation surface)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k."""
    _utc(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1999-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.max(F.unix_timestamp("o_orderdate")).alias("o_epoch"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims (region/nation broadcast; Catalyst+AQE
    pick broadcast for customer/supplier at small SF, SMJ at scale)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrdered (no global sort)."""
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
    )


def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window (reference has no windows — needed for LWW parity,
    SURVEY.md §2.C)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream (batch view)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("hour_epoch", "event_type")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min gap rule via lag + cumulative sum."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps are NTZ; session tz is UTC so LTZ cast is identity
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap_us = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


def events_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC LWW primitive on a public table: final event per key via
    partial-aggregating max_by (the skew-proof form used by lake/merge.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value"), F.struct("ts", "event_id")
            ).alias("_last")
        )
        .select(
            "user_id",
            F.col("_last.event_type").alias("last_event_type"),
            F.col("_last.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonLeaf parity (reference util/SqlFunctions.kt:46-58): raw scalar
    text extraction from a JSON column."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_text")
    ).orderBy("event_id")


def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine=INTERSECT — declared but unimplemented in the reference
    (app/OptionsEnums.kt:47-62); trivial here."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine=EXCEPT (set semantics, like SQL EXCEPT)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", F.md5(F.col("text"))).orderBy("fp")


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.normalized_fingerprint("text").alias("fp")
    ).orderBy("doc_id")


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q = textstats.quality_metrics(docs, "text")
    return q.select(
        "doc_id",
        "n_tokens",
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
    ).orderBy("doc_id")


def doc_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.regex_token_count("text").alias("n_regex_tokens")
    ).orderBy("doc_id")


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.lang_id(docs, "text").select("doc_id", "lang_guess").orderBy("doc_id")


def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, "vec_id", "embedding", _QUERY_VEC, k=20)


def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (non-SQL-expressible → rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, "doc_id", "text").orderBy("id_a", "id_b")


def minhash_md5_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded MinHash-LSH pipeline in its cross-engine-exact form
    (dedup.minhash_md5_pairs): per-permutation hashes are 8-hex md5
    draws whose lexicographic MIN equals the numeric minhash, band keys
    are the concatenated minima (no engine-specific band hash), and
    est_jaccard = matches/16 is an exact binary fraction — so banding,
    bucket cap, candidate join AND the estimate all replay in plain
    DuckDB SQL. Full oracle for the sketch pipeline whose xxhash64
    production form (minhash_near_dups) is rows-only-checkable."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_md5_pairs(docs, "doc_id", "text")
    return (
        pairs.filter(F.col("est_jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per doc (non-SQL-expressible → rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text").orderBy("doc_id")


def json_subtree_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonSubtree parity (reference util/SqlFunctions.kt:31-43): subtree
    re-serialized as JSON text — variant-based, no Python UDF."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id", json_subtree("props", "k").alias("k_json")
    ).orderBy("event_id")


def salted_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted join (lake/salt.py): bit-identical to the plain
    join, hot keys spread over salt buckets (SURVEY.md §2.D)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salt.salted_join(orders, cust, "o_custkey", salt_buckets=4)
    return (
        joined.groupBy("c_nationkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("c_nationkey")
    )


def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via inverted-index join with
    stop-shingle pruning (non-SQL-expressible → rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.4)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dup-group resolution (operators/dedup.py
    connected_components): n-gram-Jaccard near-dup pairs become an edge
    set; every document gets the min member id of its component as
    group_id (singletons map to themselves). Iterative min-label
    propagation — one long-only join + agg per round, exits on
    convergence. Oracle: DuckDB recursive CTE computing min reachable
    label over the same edges."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.4)
    groups = dedup.connected_components(
        pairs, vertices=docs.select("doc_id")
    )
    # connected_components checkpointed the edge list eagerly, so the
    # mining pipeline's pinned sketch cache can be released here
    dedup.release(pairs)
    return groups.select(
        F.col("id").alias("doc_id"), F.col("group_id")
    ).orderBy("doc_id")


def dedup_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call dedup pipeline (operators/dedup.py dedup, round-3
    verdict #4): pair mining → connected components → keeper selection
    sharing ONE mining pass; every document labeled (group_id,
    is_keeper). Oracle: the dedup_groups recursive CTE + a ranked
    window picking the keeper."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.dedup(docs, "doc_id", "text", min_jaccard=0.4)
    return out.select(
        F.col("id").alias("doc_id"), "group_id", "is_keeper"
    ).orderBy("doc_id")


def dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per dup-group keeper summary, now a thin rollup OVER the one-call
    dedup() pipeline (round-3 verdict #4: this entry used to re-mine the
    pairs dedup_groups had just mined). One partial-combined agg per
    group, no window over documents. Oracle: the dedup_groups recursive
    CTE + a ranked window."""
    docs = _t(spark, sf_dir, "documents")
    labeled = dedup.dedup(docs, "doc_id", "text", min_jaccard=0.4)
    scored = docs.select(
        F.col("doc_id").alias("sid"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        labeled.join(scored, labeled["id"] == F.col("sid"))
        .groupBy("group_id")
        .agg(
            F.max(F.when(F.col("is_keeper"), F.col("id"))).alias("keeper_id"),
            F.count("*").alias("n_members"),
            F.max("n_tokens").alias("best_n_tokens"),
        )
        .orderBy("group_id")
    )


def knn_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN (similarity.knn_join) in its exact full-probe mode:
    every 25th vector (deterministic left subset) gets its top-5 cosine
    neighbors among ALL vectors. n_probe == n_centroids ⇒ every pair is
    compared, so a DuckDB ranked cross join is the exact oracle; the
    approximate n_probe < n_centroids path is the scale story (cell
    equi-join, Σ|probed cells| cost) and is recall-tested in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("id_l"), "embedding"
    )
    right = emb.select(F.col("vec_id").alias("id_r"), "embedding")
    j = similarity.knn_join(
        left, right, "id_l", "id_r", "embedding", "embedding",
        k=5, n_centroids=8, n_probe=8,
    )
    return j.select(
        "id_l", "id_r", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("id_l", "rank")


def incremental_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus near-dup screening (dedup.incremental_lsh_pairs):
    the CDC-ingest x training-data shape — new documents (deterministic
    20% split) probe the existing corpus's banded minhash index; cost is
    O(batch) probes, never corpus². Non-SQL-expressible (minhash) →
    rows-only check; twin-verified bit-exact in tests/test_pyref_twins.py."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    pairs = dedup.incremental_lsh_pairs(corpus, batch, "doc_id", "text")
    return pairs.select(
        "batch_id", "corpus_id", F.round("est_jaccard", 6).alias("est_jaccard")
    ).orderBy("batch_id", "corpus_id")


def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over binary media columns: decode metadata via
    mapInPandas + deterministic feature vectors via Arrow-batched pandas
    UDF (rows-only check; decode stubbed per operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("media")
    )
    decoded = multimodal.decode_metadata(media, "media")
    feats = multimodal.media_features(decoded, "media", dim=8)
    return feats.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    ).orderBy("doc_id")


def media_features_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline's oracled companion: the REAL mapInPandas
    decode + Arrow pandas-UDF feature extraction run end-to-end, and
    because the deterministic stand-in features are sha256-derived
    (uint32 windows of the digest / 2^32 as float32), DuckDB re-derives
    byte count, sniffed format, and the first two feature lanes exactly
    (sha256 + little-endian hex reassembly + FLOAT cast). The pixel
    decode stays an env boundary; the Spark-side plumbing — schema, Arrow
    batching, UDF math — is what this verifies cross-engine."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("media"))
    decoded = multimodal.decode_metadata(media, "media")
    feats = multimodal.media_features(decoded, "media", dim=8)
    return feats.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
        F.round(F.element_at("features", 2).cast("double"), 6).alias("f1"),
    ).orderBy("doc_id")


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (approximate → rows-only check)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb, "vec_id", "embedding", _QUERY_VEC, k=20)


def parts_starting_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startsWith parity (reference util/SqlFunctions.kt:17-29) used as a
    filter, plus grouped counts."""
    from csv_cruncher_spark.functions import starts_with

    part = _t(spark, sf_dir, "part")
    return (
        part.filter(starts_with("p_name", F.lit("s")))
        .groupBy(F.substring("p_name", 1, 2).alias("prefix"))
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
        .orderBy("prefix")
    )


def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (advertised HSQLDB surface, README.md:36):
    stddev/variance/correlation per return flag."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 2).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 2).alias("var_disc"),
            # + 0.0 folds IEEE -0.0 to 0.0 (DuckDB's round(corr) can emit
            # -0.0 where Spark emits 0.0 — r1 hash artifact); same on oracle
            (F.round(F.corr("l_quantity", "l_extendedprice"), 2) + F.lit(0.0)).alias(
                "corr_qty_price"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def lineitem_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per group (percentile/quantile_cont SQL surface):
    interquartile price stats per return flag. Probabilities are kept to
    {0.25, 0.5, 0.75} over INTEGER cents deliberately: (n-1)*p and the
    interpolation a + (b-a)*f are then exact in IEEE double on every
    engine, so Spark and DuckDB agree bit-for-bit with no rounding
    hedge. At scale Spark's exact percentile is a single-pass typed
    aggregate with map-side partial merge (OpenHashMap of distinct
    values per partition) — fine for bounded-cardinality measures like
    prices; unbounded measures would switch to approx_percentile."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # ONE array-probability percentile aggregate, not three scalar ones:
    # each percentile agg maintains its own per-group distinct-value map,
    # so the array form is ~2x faster at sf0.1 (measured) and the gap
    # widens with group cardinality; results are bit-identical
    qs = F.percentile(
        cents, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(qs.alias("__q"), F.count(F.lit(1)).alias("n"))
        .select(
            "l_returnflag",
            F.col("__q")[0].alias("p25_cents"),
            F.col("__q")[1].alias("median_cents"),
            F.col("__q")[2].alias("p75_cents"),
            "n",
        )
        .orderBy("l_returnflag")
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED multi-plane LSH
    (round-2 verdict fix: bucket count now scales with bits_per_band
    instead of a global 2^8; the all-pairs cross join never materializes;
    value-verified by the pure-Python twin in tests/test_pyref_twins.py).

    The synthetic embeddings are near-orthogonal random vectors (max
    pairwise cosine ≈ 0.51 at sf0.01), so a threshold query over the raw
    table is vacuously empty. To exercise real recall we UNION
    deterministic planted near-copies derived from the data itself (every
    50th vector, positively rescaled — scaling preserves every LSH sign
    bit, so banded recall on the planted pairs is exactly 1 and the
    result is the planted pair set, deterministically)."""
    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.expr("transform(embedding, x -> cast(x AS double) * 1.5)").alias("embedding"),
    )
    both = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("embedding")
    ).unionByName(planted)
    pairs = similarity.pairwise_topk_within_buckets(
        both, "vec_id", "embedding", min_cosine=0.9
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded candidate pairs (pigeonhole Hamming screen;
    value-verified by the pure-Python twin)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_candidates(docs, "doc_id", "text").orderBy("id_a", "id_b")


def simhash_md5_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL simhash pipeline — token hash → per-bit vote aggregation
    → sign → banding → Hamming rerank — in its cross-engine-exact form
    (dedup.simhash_md5 + hamming_banded_pairs): one md5 per token, its
    first 15 hex chars as a 60-bit draw whose bit j is the vote for
    signature bit j. hamming_near_dups oracles the banding/rerank over a
    SURROGATE signature; this entry closes the remaining gap by oracling
    the vote aggregation itself. The xxhash64 production form
    (simhash_near_dups / simhash_signatures) stays rows-only-checkable."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.simhash_md5(docs, "doc_id", "text")
    pairs = dedup.hamming_banded_pairs(
        sig, "doc_id", "simhash", band_bits=15, max_bucket=None,
        with_hamming=True, max_hamming=12,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


def hamming_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simhash pipeline's banding + Hamming-rerank math
    (dedup.hamming_banded_pairs — the EXACT code path simhash_candidates
    runs) over a deterministic md5-derived 60-bit surrogate signature,
    which makes it fully DuckDB-oracle-able (bit_count(xor) + band
    equality in plain SQL). Round-3 verdict #3: an oracled companion for
    the xxhash-based simhash entries."""
    docs = _t(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias("sig"),
    )
    pairs = dedup.hamming_banded_pairs(
        sig, "doc_id", "sig", band_bits=16, max_bucket=None, with_hamming=True
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


def ann_lsh_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_lsh_topk in FULL-probe mode (probe set = every bucket): the
    bucketing expression, probe filter, and exact cosine rerank all
    execute, and the result provably equals brute force — so this entry
    shares the brute-force DuckDB oracle (round-3 verdict #3, the
    knn_join_exact trick applied to the LSH ANN path; the production
    n_probe_buckets < 2^n_planes path is recall-tested in pytest)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(
        emb, "vec_id", "embedding", _QUERY_VEC, k=20, n_planes=4,
        n_probe_buckets=16,
    )


def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): each purchase attributed to the
    user's latest view at-or-before the purchase time. One shuffle on the
    key (union-and-carry plan), never a range cross join; DuckDB's native
    ASOF JOIN is the oracle."""
    from csv_cruncher_spark.operators import joins

    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    j = joins.asof_join(purchases, views, on="user_id", left_time="ts")
    return j.select(
        "event_id",
        F.round("value", 2).alias("value"),
        F.col("r_view_id").alias("view_id"),
        F.unix_micros(F.col("r_ts").cast("timestamp_ltz")).alias("view_epoch_us"),
    ).orderBy("event_id")


def asof_forward_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (round-2 verdict item #4): each purchase paired
    with the user's EARLIEST view at-or-after the purchase time. Same
    one-shuffle union-and-carry plan with the window flipped to
    first-over-[current, following]; DuckDB ASOF with a <= condition is
    the oracle."""
    from csv_cruncher_spark.operators import joins

    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    j = joins.asof_join(purchases, views, on="user_id", left_time="ts", direction="forward")
    return j.select(
        "event_id",
        F.round("value", 2).alias("value"),
        F.col("r_view_id").alias("view_id"),
        F.unix_micros(F.col("r_ts").cast("timestamp_ltz")).alias("view_epoch_us"),
    ).orderBy("event_id")


def asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window as-of join: attribution only counts views within 30
    minutes before the purchase; a nearest match farther away is nulled
    (pandas merge_asof tolerance semantics — exact, because the as-of
    match is already the nearest qualifying row). Oracle: DuckDB ASOF +
    post-hoc interval filter."""
    from csv_cruncher_spark.operators import joins

    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    j = joins.asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        tolerance=F.expr("INTERVAL '30' MINUTE"),
    )
    return j.select(
        "event_id",
        F.col("r_view_id").alias("view_id"),
        F.unix_micros(F.col("r_ts").cast("timestamp_ltz")).alias("view_epoch_us"),
    ).orderBy("event_id")


def events_type_hour_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (grouping sets) — multi-level aggregates in one
    pass (Spark expands grouping sets in a single shuffle)."""
    _utc(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(unix_timestamp(date_trunc('hour', ts)), -1) AS hour_epoch,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY ROLLUP(event_type, date_trunc('hour', ts))
        ORDER BY event_type, hour_epoch
        """
    )


def dual_constant_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual/constant SELECT (reference uses FROM (VALUES(0)) AS dual,
    it/SqlFunctionsTest.kt:75,90) — closes the one untested §2.C row."""
    return spark.sql(
        "SELECT CAST(1 AS BIGINT) AS one, 'x' AS s, "
        "round(sqrt(2.0), 6) AS root2, CAST(NULL AS STRING) AS nothing"
    )


def recursive_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (reference advertises recursive queries,
    /root/reference/README.md:31-32; HSQLDB executes them natively).
    Spark 4.1 executes WITH RECURSIVE — transitive ancestor walk over a
    synthetic parent chain (parent(n) = n - 5) derived from nation."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH RECURSIVE chain(nationkey, anc, depth) AS (
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                 CAST(0 AS BIGINT) FROM nation
          UNION ALL
          SELECT c.nationkey, CAST(n.n_nationkey AS BIGINT), c.depth + 1
          FROM chain c JOIN nation n ON n.n_nationkey = c.anc - 5
          WHERE c.anc >= 5
        )
        SELECT nationkey, max(depth) AS depth, min(anc) AS root_key
        FROM chain GROUP BY nationkey ORDER BY nationkey
        """
    )


def json_leaves_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonLeaves parity (reference util/SqlFunctions.kt:77-89,143-176):
    per array element, extract the scalar at the leaves subpath; the
    byte-parity text form serializes the array like HSQLDB (which cannot
    return ARRAY). The nested array JSON is constructed from event data."""
    from csv_cruncher_spark.functions import json_leaves_text

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    j = F.format_string(
        '{"items": [{"v": %s}, {"v": %s}]}',
        F.get_json_object("props", "$.k"),
        F.col("event_id").cast("string"),
    )
    return ev.select(
        "event_id", json_leaves_text(j, "items", "v").alias("leaves")
    ).orderBy("event_id")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with full-probe (n_probe == n_centroids ⇒ exact) — exact
    by construction, so it shares the brute-force DuckDB oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, "vec_id", "embedding", _QUERY_VEC, k=20, n_centroids=8, n_probe=8
    )


def bloom_screened_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter batch admission (operators/bloom.py): the CDC shape
    "which of this change batch's documents are NEW content?" — a
    distributed Bloom index (DataFrame of set bit positions) screens the
    batch with zero corpus access, and only the maybe-present sliver is
    confirmed with an exact anti-join. No false negatives ⇒ the result
    is IDENTICAL to the plain anti-join, which is the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.md5("text").alias("fp")
    )
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("fp")
    )
    admitted = bloom.bloom_admit(corpus, batch, "fp", n_bits=1 << 16)
    return admitted.select("doc_id", "fp").orderBy("doc_id")


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/redundancy quality signals
    (textstats.repetition_stats): duplicate-token and duplicate-bigram
    fractions per document via explode + two-level partial-combined
    hash aggregation — no windows, no Python."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.repetition_stats(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("distinct_token_frac", 6).alias("distinct_token_frac"),
        F.round("top_token_frac", 6).alias("top_token_frac"),
        "n_bigrams",
        F.round("dup_bigram_frac", 6).alias("dup_bigram_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    ).orderBy("doc_id")


def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (textstats.redact_pii): emails/phones planted
    deterministically from doc_id (the corpus has none), then redacted
    with JVM regexp_replace. The redacted TEXT is returned raw so the
    oracle check is byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" or call 555 123-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = textstats.redact_pii(planted, "text")
    return out.select("doc_id", "n_emails", "n_phones", "redacted").orderBy("doc_id")


def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization for CDC keying (functions/urls.py): every
    document gets TWO url spellings (canonical + a shouty variant with
    default port, trailing slash, and fragment); normalize_url must fold
    them to one key, so n_pages (distinct normalized) is half n_urls per
    host. parse_url is JVM-native; the oracle reimplements the formula
    with plain regex SQL."""
    docs = _t(spark, sf_dir, "documents")
    base = F.concat(
        F.col("source"), F.lit(".example.com/"), F.col("lang"),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    u1 = F.concat(F.lit("https://www."), base)
    u2 = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".EXAMPLE.COM:443/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("/#frag"),
    )
    urls = docs.select(
        "doc_id", "n_chars", F.explode(F.array(u1, u2)).alias("url")
    )
    return (
        urls.select(
            "n_chars",
            url_host("url").alias("host"),
            url_domain("url").alias("domain"),
            normalize_url("url").alias("nurl"),
        )
        .groupBy("host", "domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("nurl").alias("n_pages"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("host")
    )


def incremental_jaccard_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-Jaccard batch-vs-corpus near-dup screening
    (dedup.incremental_jaccard_pairs): the oracled companion to the
    minhash-sketch incremental screen — same inverted-index probe shape
    (O(batch postings), corpus-df stop-shingle cutoff), deterministic
    Jaccard, full DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    pairs = dedup.incremental_jaccard_pairs(
        corpus, batch, "doc_id", "text", min_jaccard=0.4
    )
    return pairs.select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("batch_id", "corpus_id")


def cdc_admission_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-batch CDC content-admission decision
    (dedup.admission_screen): Bloom-screened exact-duplicate flag +
    exact-Jaccard near-duplicate flag + admit verdict, end-to-end
    DuckDB-oracled (the Bloom screen's no-false-negative property makes
    it invisible in the result)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    out = dedup.admission_screen(
        corpus, batch, "doc_id", "text", min_jaccard=0.4, n_bits=1 << 16
    )
    return out.select(
        F.col("id").alias("doc_id"), "exact_dup", "near_dup", "admitted"
    ).orderBy("doc_id")


def ivm_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (lake/ivm.py): the
    per-event_type (user count, total cents) aggregate over the LWW user
    state is bootstrapped from a 3/4 subset of events, then the NET
    I/U/D change feed (with pre-images) folds the remaining quarter in —
    O(changed keys), no recompute. The DuckDB oracle recomputes the
    aggregate from the FULL final state, so any error in the
    retraction/addition math (group moves, group death, null-sum
    restore) breaks the value hash. Cents as BIGINT so maintained and
    recomputed sums are bit-equal (no float-retraction drift)."""
    ev = _t(spark, sf_dir, "events")

    def state(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "value"), F.struct("ts", "event_id")
                ).alias("_l")
            )
            .select(
                "user_id",
                F.col("_l.event_type").alias("event_type"),
                F.round(F.col("_l.value") * 100).cast("long").alias("value_cents"),
            )
        )

    pre = state(ev.filter(F.col("event_id") % 4 != 0))
    post = state(ev)
    group, sums = ["event_type"], {"sum_cents": "value_cents"}
    maintained = ivm.apply_changes_to_agg(
        ivm.compute_agg(pre, group, sums, count_col="n_users"),
        ivm.diff_states(pre, post, "user_id"),
        group,
        sums,
        count_col="n_users",
    )
    return maintained.select(
        "event_type", "n_users", "sum_cents"
    ).orderBy("event_type")


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing (sampling.stratified_sample): keep
    50% of en, 25% of de, drop zh, 10% of everything else — membership
    is a pure function of md5(doc_id, salt), so the DuckDB oracle
    re-derives the EXACT row set (not just the counts) from the same
    math. Plan is a single narrow filter: no shuffle, no UDF, quota map
    as a literal expression."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.5, "de": 0.25, "zh": 0.0},
        default_fraction=0.1,
        salt="mix-v1",
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (sampling.assign_split):
    hash-space range partition, leakage-safe (a key's split never
    changes as the corpus grows). Oracle recomputes every per-split
    count and char total from the same md5 range math."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.assign_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split-v1"
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


def sql_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-registered function surface (functions/sql_registry.py)
    driven the way a reference user drives it — ONE SQL string calling
    jsonLeaf (reference argument order, SqlFunctions.kt:49), hashBucket,
    hashKeep, and assignSplit. The bodies inline to Catalyst expressions
    (plan-pinned Python-free by test_sql_functions), so this is a single
    narrow projection+filter; the oracle re-derives every value from raw
    md5/json math in DuckDB."""
    from csv_cruncher_spark.functions import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000).createOrReplaceTempView(
        "ev_sqlfn"
    )
    return spark.sql(
        """
        SELECT event_id,
               jsonLeaf('k', props) AS k_text,
               hashBucket(CAST(user_id AS STRING), 'cohort-v1') AS cohort_bucket,
               assignSplit(CAST(event_id AS STRING), 0.8d, 0.1d, 'ev-split') AS split
        FROM ev_sqlfn
        WHERE hashKeep(CAST(event_id AS STRING), 0.5d, 'keep-v1')
        ORDER BY event_id
        """
    )


def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (textstats.token_frequencies): exact tf + df
    for every token with tf >= 3, top 100 by frequency. Two-level hash
    aggregation — per-(token, doc) partial combine, then per-token —
    so exact document frequency costs no count(distinct) Expand and the
    'the'-skew arrives pre-summed. Oracle re-derives both counts from
    the same regex tokenizer via unnest."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.token_frequencies(docs, "doc_id", "text", min_tf=3)
    return out.orderBy(F.desc("tf"), "token").limit(100)


def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus construction (corpus.build_corpus): token gate
    -> exact dedup (min-id keeper per normalized fingerprint) -> per-
    language quotas -> train/val/test split, all in ONE shuffle
    (plan-pinned in tests). Row-level oracle: DuckDB replays the whole
    pipeline — gate, window-min keeper, md5 quota and split math — and
    must reproduce the EXACT surviving (doc_id, lang, split) set."""
    docs = _t(spark, sf_dir, "documents")
    out = corpus.build_corpus(
        docs,
        "doc_id",
        "text",
        "lang",
        min_tokens=10,
        quotas={"en": 0.9, "de": 0.5},
        default_quota=0.25,
        splits={"train": 8, "val": 1, "test": 1},
    )
    return out.select("doc_id", "lang", "split").orderBy("doc_id")


def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination screen (operators/decontam.py): every
    40th document plays the eval benchmark; the report counts, per
    contaminated corpus doc, how many distinct lowercase word 8-grams it
    shares with the benchmark. Broadcast shape — the corpus n-gram
    stream is filtered through the (tiny) benchmark n-gram set before
    any shuffle. Benchmark members themselves surface as fully
    contaminated; their planted near-copies surface via shared runs of
    ≥8 words."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=8)
    return rep.select(
        F.col("id").alias("doc_id"), "n_hit_ngrams"
    ).orderBy("doc_id")


def decontaminated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontam.decontaminate end-to-end: the corpus minus every doc
    sharing ≥1 benchmark 8-gram — full schema passes through, the
    removal is a broadcast anti join (no corpus shuffle). Row-level
    oracle: NOT EXISTS over the same n-gram join in SQL."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    out = decontam.decontaminate(docs, bench, "doc_id", "text", n=8)
    return out.select("doc_id", "lang", "n_chars").orderBy("doc_id")


def boilerplate_removed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate line removal (operators/boilerplate.py)
    end-to-end: the newline-free synthetic docs get deterministic
    'lines' (12-word chunks — same derivation in both engines), then the
    REAL mine → mark → order-preserving rebuild runs with min_docs=3.
    Near-dup docs share aligned chunks, so the mined set is non-trivial.
    Row-level oracle: DuckDB replays the chunking, the two-level distinct
    frequency, and the ordered string_agg rebuild."""
    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.expr(
                "transform(sequence(1, int(ceil(size(split(text, ' ')) / 12.0))),"
                " i -> concat_ws(' ', slice(split(text, ' '), (i-1)*12 + 1, 12)))"
            ),
            "\n",
        ).alias("text"),
    )
    out = boilerplate.remove_boilerplate_lines(lined, "doc_id", "text", min_docs=3)
    return out.select(
        "doc_id", "text", "n_kept_lines", "n_removed_lines"
    ).orderBy("doc_id")


def paragraph_deduped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText-style keep-first duplicate-paragraph removal
    (operators/boilerplate.py dedup_paragraphs) end-to-end: the same
    deterministic 12-word chunking as boilerplate_removed_docs stands in
    for paragraphs, then every chunk repeated anywhere in the corpus
    keeps only its lowest-(doc_id, position) occurrence — threshold-free,
    unlike the min_docs boilerplate rule — and documents are rebuilt in
    order. Near-dup docs share aligned chunks, so removals are
    non-trivial. Row-level oracle: DuckDB replays the chunking, the
    keep-first rule (row_number over the paragraph partition — the
    oracle may window where the engine must aggregate), and the ordered
    string_agg rebuild."""
    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.expr(
                "transform(sequence(1, int(ceil(size(split(text, ' ')) / 12.0))),"
                " i -> concat_ws(' ', slice(split(text, ' '), (i-1)*12 + 1, 12)))"
            ),
            "\n",
        ).alias("text"),
    )
    out = boilerplate.dedup_paragraphs(lined, "doc_id", "text", sep="\n")
    return out.select(
        "doc_id", "text", "n_kept_paras", "n_removed_paras"
    ).orderBy("doc_id")


def temperature_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixed corpus (sampling.temperature_sample, α=0.5,
    target = 60% of rows): per-language keep fractions ∝ √n_g flatten
    the language distribution; membership is the deterministic md5
    threshold, so DuckDB re-derives the EXACT surviving row set from the
    same histogram → sqrt → round(·,6) → '%08x' threshold math."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.temperature_sample(
        docs, "doc_id", "lang", alpha=0.5, target_fraction=0.6
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 training order (operators/shuffle.py):
    sharded md5 permutation — per-shard ordered window + literal-map
    offsets, never a single global sort. DuckDB re-derives the identical
    (shard, pos_in_shard, global_pos) for every doc from the same draw
    math (prefix-sum offsets instead of the literal map)."""
    from csv_cruncher_spark.operators import shuffle as shuffle_op

    docs = _t(spark, sf_dir, "documents")
    out = shuffle_op.epoch_shuffle(docs, "doc_id", epoch=1, n_shards=16)
    return out.select("doc_id", "shard", "pos_in_shard", "global_pos").orderBy(
        "global_pos"
    )


def quality_percentile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-threshold quality selection (operators/ranking.py):
    keep each language's top half by token count via ONE
    partial-combined exact percentile aggregate + a broadcast threshold
    join — never a per-stratum sort window. Integer scores at p=0.5 make
    the interpolated threshold exact in both engines (the established
    quantile-oracle trick), so DuckDB reproduces the row set and the
    applied thresholds bit-for-bit."""
    from csv_cruncher_spark.operators import ranking

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn(
        "score", textstats.regex_token_count("text").cast("long")
    )
    out = ranking.percentile_filter(
        scored, "score", keep_fraction=0.5, stratum_col="lang",
        threshold_out="thr",
    )
    return out.select(
        "doc_id", "lang", "score", F.round("thr", 6).alias("thr")
    ).orderBy("doc_id")


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality scoring (textstats.unigram_logprob): docs
    self-scored against the corpus' top-400 vocabulary, rarer tokens
    taking the OOV half-occurrence penalty. The per-doc total
    accumulates in FIXED POINT (micro-units of ln p, 64-bit integer
    sum — order-independent, so shuffle order can't move the hash), and
    DuckDB reproduces vocabulary, smoothing, and the score bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.unigram_logprob(docs, "doc_id", "text", top_k=400)
    return out.select(
        "doc_id", "n_tokens", "n_oov", "avg_logprob"
    ).orderBy("doc_id")


def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM scoring with stupid backoff (textstats.bigram_logprob,
    Brants et al. 2007): in-model bigrams score the exact conditional
    ln(c(w1,w2)/c(w1·)), unseen bigrams back off to 0.4×unigram, OOV
    takes the half-occurrence penalty — the fluency signal a unigram
    screen can't see (common words in nonsense order). Model tables
    bounded top-300/top-200 for the oracle; per-doc totals in integer
    micro-units (order-independent), so DuckDB reproduces model, backoff
    and score bit-for-bit — including the parallel-unnest bigram zip."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.bigram_logprob(
        docs, "doc_id", "text", top_k_bigrams=300, top_k_unigrams=200
    )
    return out.select(
        "doc_id", "n_bigrams", "n_backoff", "n_oov", "avg_logscore"
    ).orderBy("doc_id")


def doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance log-weights (textstats.importance_logweight,
    Xie et al. 2023): per doc, Σ_tokens [ln P_target − ln P_raw] with the
    English documents as the target distribution and the full corpus as
    raw — en-typical docs weigh positive, the rest negative. Both
    vocabularies bounded top-250; per-token deltas in integer micro-units
    so the sum is order-independent, and the logweight is the raw double
    of the exact micro-sum — DuckDB reproduces vocab, smoothing, and the
    weight bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    target = textstats.token_frequencies(
        docs.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    out = textstats.importance_logweight(
        docs, "doc_id", "text", target_vocab=target, top_k=250
    )
    return out.select("doc_id", "n_tokens", "logweight").orderBy("doc_id")


DISCLAIMER = (
    " standard disclaimer all rights reserved contact the site "
    "administrator for details"
)


def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed exact-substring duplicate detection
    (textstats.duplicate_spans, the Lee et al. 2021 dedup target):
    every 8-token window shared verbatim by ≥2 documents, per (doc,
    position). The synthetic corpus has no natural verbatim 8-grams, so
    every 5th doc gets an identical planted disclaimer suffix — built
    with the same expression in both engines — whose fully-interior
    windows must be flagged with the exact sharing count."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(DISCLAIMER)).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = textstats.duplicate_spans(planted, "doc_id", "text", span_tokens=8)
    return out.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "span_docs"
    ).orderBy("doc_id", "pos")


def duplicate_spans_removed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring REMOVAL (textstats.remove_duplicate_spans, the
    Lee et al. 2021 cut itself): the same planted-disclaimer corpus as
    doc_duplicate_spans, but every 8-token duplicated window occurrence
    after the global first (lowest (doc_id, pos)) cuts its token
    coverage, and documents are rebuilt from surviving tokens. The
    lowest planted doc keeps its disclaimer; every later multiple-of-5
    doc loses the interior of the repeated suffix (boundary tokens whose
    straddling windows are doc-unique survive — the oracle replays that
    exactly). Row-level oracle: DuckDB re-derives windows, keep-first
    rule, coverage union, and the ordered token rebuild."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(DISCLAIMER)).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = textstats.remove_duplicate_spans(planted, "doc_id", "text", span_tokens=8)
    return out.select(
        "doc_id", "text", "n_kept_tokens", "n_removed_tokens"
    ).orderBy("doc_id")


def doc_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (textstats.clean_text): NFC via the
    Arrow pandas UDF, then JVM-regex control strip + whitespace
    collapse. The ASCII corpus would make NFC vacuous, so each doc gets
    a planted suffix — decomposed e+COMBINING ACUTE, a BEL control, a
    doubled space — built with the identical expression in both engines;
    DuckDB's nfc_normalize must compose it to the same bytes the Python
    unicodedata UDF produces."""
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" caf"), F.lit("e\u0301"), F.lit(" \x07x  y")
        ).alias("text"),
    )
    out = textstats.clean_text(dirty, "text")
    return out.select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars_clean")
    ).orderBy("doc_id")


def source_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus cap (ranking.cap_per_group, the C4/Gopher
    max-pages-per-domain rule): at most 15 docs per source, picked by
    the deterministic epoch-salted md5 draw with doc_id tiebreak — so
    DuckDB's row_number over the identical (draw, doc_id) order
    reproduces the exact survivor set."""
    from csv_cruncher_spark.operators import ranking

    docs = _t(spark, sf_dir, "documents")
    out = ranking.cap_per_group(docs, "source", k=15, id_col="doc_id")
    return out.select("doc_id", "source", "lang").orderBy("doc_id")


def corpus_build_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone pipeline with the round's new stages wired in:
    token gate → test-set DECONTAMINATION (broadcast n-gram screen,
    every 40th doc as the benchmark) → exact-fingerprint dedup →
    TEMPERATURE mixing (α=0.5 over the deduped survivors' histogram)
    → train/val/test split. One corpus shuffle total (the fp keeper
    window; the decontam stage is a broadcast anti join). DuckDB
    replays every stage row-level."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    out = corpus.build_corpus(
        docs,
        "doc_id",
        "text",
        "lang",
        min_tokens=10,
        decontam={"bench": bench, "n": 8},
        temperature={"alpha": 0.5, "target_fraction": 0.5},
        splits={"train": 8, "val": 1, "test": 1},
    )
    return out.select("doc_id", "lang", "split").orderBy("doc_id")


def curriculum_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call curriculum layout (operators/curriculum.py): quality
    score → per-language exact-percentile selection (top half, integer
    scores at p=0.5 = cross-engine-exact threshold) → per-source cap
    (k=20, payload-free window + semi-join) → sequence packing into
    1024-token chunks over 8 shards → epoch-1 shuffle over 16 shards.
    Every stage deterministic and replayed row-level by DuckDB — the
    composed (selection ∘ geometry ∘ order) answer hashes bit-for-bit."""
    from csv_cruncher_spark.operators import curriculum

    docs = _t(spark, sf_dir, "documents")
    out = curriculum.build_curriculum(
        docs,
        "doc_id",
        "text",
        stratum_col="lang",
        source_col="source",
        keep_fraction=0.5,
        cap_k=20,
        budget=1024,
        n_shards=8,
        epoch=1,
        shuffle_shards=16,
    )
    return out.select(
        "doc_id", "lang", "score", "pack_shard", "start_offset",
        "first_chunk", "last_chunk", "shuffle_shard", "pos_in_shard",
        "global_pos",
    ).orderBy("doc_id")


def url_snapshot_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy URL dedup across crawl snapshots — the CDC keying loop
    closed end-to-end: every page arrives twice under trivially
    different spellings (scheme/host case, :443 default port, trailing
    slash, fragment) with different warc_ts; ``normalize_url`` folds
    both onto ONE canonical key and the engine's in-batch LWW
    (``lww_winners`` — the same partial-aggregating max_by the merge
    path runs) keeps the newer snapshot's content. The oracle constructs
    the canonical key independently and replays the arg_max, so a
    normalization drift OR a wrong winner both flip the hash."""
    from csv_cruncher_spark.lake.merge import lww_winners

    docs = _t(spark, sf_dir, "documents")
    t0 = F.lit(1_700_000_000).cast("long")
    old = docs.select(
        F.concat(
            F.lit("https://www."), "source", F.lit(".example.com/"),
            "lang", F.lit("/"), "doc_id",
        ).alias("url"),
        (t0 + F.col("doc_id")).alias("warc_ts"),
        (F.col("doc_id") * 2).cast("long").alias("row_idx"),
        F.lit("old").alias("crawl"),
        "doc_id",
    )
    new = docs.select(
        F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"),
            F.lit(".EXAMPLE.COM:443/"), "lang", F.lit("/"), "doc_id",
            F.lit("/#frag"),
        ).alias("url"),
        (t0 + F.col("doc_id") + 86400).alias("warc_ts"),
        (F.col("doc_id") * 2 + 1).cast("long").alias("row_idx"),
        F.lit("new").alias("crawl"),
        "doc_id",
    )
    snaps = old.unionByName(new).withColumn("nurl", normalize_url(F.col("url")))
    winners = lww_winners(
        snaps.select("nurl", "warc_ts", "row_idx", "crawl", "doc_id"),
        key_col="nurl",
    )
    return winners.select("nurl", "doc_id", "crawl", "warc_ts").orderBy("nurl")


def _crawl_snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two deterministic crawl snapshots of the documents corpus: the
    new crawl drops doc_id%7==0 (deleted), re-fetches doc_id%7==1 with
    edited content and a newer timestamp (changed), discovers a second
    page for doc_id%7==3 (added), and re-serves everything else
    byte-identically (unchanged — the 99% case a monthly recrawl is)."""
    docs = _t(spark, sf_dir, "documents")
    t0 = F.lit(1_700_000_000).cast("long")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    m = F.col("doc_id") % 7
    old = docs.select(
        url.alias("url"), (t0 + F.col("doc_id")).alias("warc_ts"), "text", "lang"
    )
    new_kept = docs.filter(m != 0).select(
        url.alias("url"),
        F.when(m == 1, t0 + F.col("doc_id") + 86400)
        .otherwise(t0 + F.col("doc_id"))
        .alias("warc_ts"),
        F.when(m == 1, F.concat("text", F.lit(" [v2]")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    added = docs.filter(m == 3).select(
        F.concat(url, F.lit("?page=2")).alias("url"),
        (t0 + F.col("doc_id") + 172_800).alias("warc_ts"),
        "text",
        "lang",
    )
    return old, new_kept.unionByName(added)


def crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differ (operators/snapshot.py snapshot_diff): classify
    every url across two crawl snapshots as added/changed/unchanged/
    deleted via md5 fingerprints over (lang, text, warc_ts). The diff
    join carries ONLY (key, fp) — payload never enters the exchange
    (plan-pinned in tests/test_snapshot.py). The oracle rebuilds both
    snapshots and fingerprints independently and replays the FULL OUTER
    classification, so a fingerprint drift or a misclassification both
    flip the hash."""
    from csv_cruncher_spark.operators.snapshot import snapshot_diff

    old, new = _crawl_snapshots(spark, sf_dir)
    return snapshot_diff(old, new, key_col="url").orderBy("url")


def snapshot_cdc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-batch generation (operators/snapshot.py
    snapshot_to_changes): the op-coded CDC batch whose application
    carries a table from the old crawl snapshot to the new one — I for
    discovered urls, U (with the new payload) for changed ones, D (key +
    delete cut time only) for departed ones; unchanged urls emit
    NOTHING, which is what keeps a 99%-unchanged monthly recrawl cheap.
    Round-trip through the real merge path is pinned in
    tests/test_snapshot.py; here the oracle replays the diff and the
    payload recovery join bit-for-bit."""
    from csv_cruncher_spark.operators.snapshot import snapshot_to_changes

    old, new = _crawl_snapshots(spark, sf_dir)
    batch = snapshot_to_changes(old, new, key_col="url", delete_ts=1_900_000_000)
    return batch.select("op", "url", "warc_ts", "text", "lang").orderBy("url", "op")


def snapshot_text_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot text reuse (operators/snapshot.py
    text_reuse_report): per NEW-crawl url, the fraction of its distinct
    3-shingles already present anywhere in the OLD crawl — the
    "how much of this crawl is copied text" curation diagnostic the
    byte-level differ can't see (a moved/mirrored page diffs as
    added+deleted but reuses 100%). Old side reduces to ONE global
    distinct-shingle frame, reuse is a left-semi join (no payload in
    any exchange); oracle rebuilds both snapshots and replays the
    shingle set algebra with exact integer counts."""
    from csv_cruncher_spark.operators.snapshot import text_reuse_report

    old, new = _crawl_snapshots(spark, sf_dir)
    return text_reuse_report(old, new, key_col="url", text_col="text", k=3).orderBy(
        "url"
    )


def _synthetic_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (url, html) crawl pages over the documents corpus:
    every page carries an absolute hub link, a root-relative index link,
    a directory-relative sibling link, a protocol-relative CDN link
    (doc_id%3==0), a fragment-stripped duplicate-host link (doc_id%4==0),
    plus always-dropped fragment-only and mailto anchors."""
    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
    )
    html = F.concat(
        F.lit('<html><body><a href="https://hub.example.org/d'),
        (m % 50).cast("string"),
        F.lit('">h</a><a href="/idx/'),
        (m % 17).cast("string"),
        F.lit('.html">r</a><a class="s" href="p'),
        (m % 5).cast("string"),
        F.lit('.html">p</a>'),
        F.when(
            m % 3 == 0, F.lit('<a href="//cdn.example.net/lib.js">c</a>')
        ).otherwise(F.lit("")),
        F.lit('<a href="#top">t</a><a href="mailto:x@example.com">m</a>'),
        F.when(
            m % 4 == 0, F.lit('<a href="https://dup.example.com/z#sec">z</a>')
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return docs.select(url.alias("url"), html.alias("html"))


def page_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction (operators/links.py extract_outlinks): every
    resolvable <a href> of the synthetic crawl pages, resolved against
    the page url (absolute pass-through, scheme drop, protocol-/root-/
    directory-relative resolution, fragment strip) — all JVM regex +
    CASE, zero Python, zero shuffles before the distinct. The oracle
    never parses html: it constructs the expected edge set independently
    from the same page-synthesis formula, so a regex slip, a resolution
    bug, and a missed drop all flip the hash."""
    from csv_cruncher_spark.operators.links import extract_outlinks

    pages = _synthetic_pages(spark, sf_dir)
    return extract_outlinks(pages).orderBy("url", "outlink")


def host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph contraction (operators/links.py contract_host_graph):
    the url-level outlink edges collapsed to (src_host, dst_host) with
    n_links / n_src_pages / n_dst_urls weights — the ~10^7-node graph
    crawl schedulers and mirror/spam analytics actually run on when the
    url graph has 10^10 nodes. Intra-host (navigation) edges dropped.
    The oracle constructs the url edges from the page-synthesis formula
    (never parsing html), extracts hosts by regex, and replays the
    same cross-host group-count."""
    from csv_cruncher_spark.operators.links import (
        contract_host_graph,
        extract_outlinks,
    )

    pages = _synthetic_pages(spark, sf_dir)
    return contract_host_graph(extract_outlinks(pages)).orderBy(
        "src_host", "dst_host"
    )


def host_crawl_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level crawl ranking: the url outlink edges contracted to the
    weighted host graph (operators/links.py contract_host_graph), then
    weighted variable-degree PageRank (operators/graph.py
    pagerank_weighted) over it — the production composition for
    prioritizing WHICH HOSTS to crawl when the url graph is 10^10 nodes
    (host nodes are string-keyed; nothing is cast to ids). All
    arithmetic int64 ((rank * w) div out_w contributions), so the
    DuckDB oracle unrolls the same 3 damped iterations bit-for-bit on
    edges it constructs from the page-synthesis formula."""
    from csv_cruncher_spark.operators.graph import pagerank_weighted
    from csv_cruncher_spark.operators.links import (
        contract_host_graph,
        extract_outlinks,
    )

    pages = _synthetic_pages(spark, sf_dir)
    hg = contract_host_graph(extract_outlinks(pages))
    ranks = pagerank_weighted(
        hg, "src_host", "dst_host", weight_col="n_links", iterations=3
    )
    return ranks.select(F.col("node").alias("host"), "rank_micro").orderBy(
        F.col("rank_micro").desc(), F.col("host")
    )


def crawl_budget_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder crawl-budget apportionment (operators/crawl.py
    apportion_budget): 100k fetches split across the synthetic pages
    proportionally to their outlink counts — SUM(quota) == 100000
    exactly; base (w*B) div R plus one bonus unit for the L largest
    remainders (ties by url). The global remainder rank runs through
    ranking.global_rank (range-repartition + per-partition row_number +
    O(partitions) offsets — never a single-task ORDER BY window); the
    DuckDB oracle replays the same integer arithmetic with a plain
    ROW_NUMBER, and the repeated-weight tie classes exercise the
    key-ascending tie-break end to end."""
    from csv_cruncher_spark.operators.crawl import apportion_budget
    from csv_cruncher_spark.operators.links import extract_outlinks

    pages = _synthetic_pages(spark, sf_dir)
    w = (
        extract_outlinks(pages)
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_outlinks"))
    )
    return apportion_budget(w, "url", "n_outlinks", 100_000).orderBy(
        F.desc("quota"), "url"
    )


def crawl_discovered_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier discovery (operators/links.py discovered_frontier):
    outlinks of the corpus that the corpus does not already contain,
    counted distinct per target host — the feed `crawl_schedule`
    dispatches next. Pages self-link via a root-relative href (resolves
    to their own url → anti-joined away as known) and fan out to
    frontier hosts + undiscovered sibling paths; the oracle replays the
    resolution, known-set subtraction, and per-host distinct count from
    the synthesis formula."""
    from csv_cruncher_spark.operators.links import discovered_frontier

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
    )
    html = F.concat(
        F.lit('<a href="/a/'),
        m.cast("string"),
        F.lit('">self</a><a href="https://frontier-'),
        (m % 7).cast("string"),
        F.lit(".example.net/x/"),
        (m % 23).cast("string"),
        F.lit('">n</a><a href="new/'),
        (m % 13).cast("string"),
        F.lit('.html">n2</a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return discovered_frontier(pages).orderBy("host")


def url_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (operators/redirects.py
    resolve_redirects): pointer-doubling folds a redirect edge list into
    src → final-landing-url in O(log max-chain) self-joins. Synthetic
    edges: u(i) → u(i−1) for i%5≠0 (chains of 1-4 hops landing on the
    i%5==0 urls) plus a deliberate 2-cycle pair per i%97==3 (orbits
    deterministically, comes back resolved=false). The oracle unrolls
    the SAME 3 doubling rounds as left-join CTEs, so chain folding, hop
    accounting, and the cycle orbit all replay bit-for-bit."""
    from csv_cruncher_spark.operators.redirects import resolve_redirects

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    u = F.concat(F.lit("https://r.example.com/u/"), m.cast("string"))
    u_prev = F.concat(F.lit("https://r.example.com/u/"), (m - 1).cast("string"))
    chain = docs.filter(m % 5 != 0).select(u.alias("src"), u_prev.alias("dst"))
    loops = docs.filter(m % 97 == 3)
    loop_x = loops.select(
        F.concat(u, F.lit("?x")).alias("src"), F.concat(u, F.lit("?y")).alias("dst")
    )
    loop_y = loops.select(
        F.concat(u, F.lit("?y")).alias("src"), F.concat(u, F.lit("?x")).alias("dst")
    )
    edges = chain.unionByName(loop_x).unionByName(loop_y)
    return resolve_redirects(edges, rounds=3).orderBy("src")


def robots_filtered_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style REP screening (operators/robots.py
    robots_filter): longest-prefix rule wins, tie → allow, no match →
    allowed. Per-source rule sets vary deterministically (/private/
    disallowed everywhere; /private/pub re-allowed on even-numbered
    sources — the longest-prefix override; /a/ disallowed on sources
    divisible by 3), frontier paths cycle through all four regimes. The
    oracle replays the precedence as a ROW_NUMBER ordered (len DESC,
    allow DESC, prefix DESC) — the exact tie order of the struct MAX."""
    from csv_cruncher_spark.operators.robots import robots_filter

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    path = (
        F.when(m % 4 == 0, F.concat(F.lit("/a/"), m.cast("string")))
        .when(m % 4 == 1, F.concat(F.lit("/private/"), m.cast("string")))
        .when(m % 4 == 2, F.concat(F.lit("/private/pub"), m.cast("string")))
        .otherwise(F.concat(F.lit("/b/"), m.cast("string")))
    )
    frontier = docs.select(
        F.concat(F.lit("https://"), "source", F.lit(".example.com"), path).alias(
            "url"
        )
    )
    hosts = docs.select("source").distinct()
    num = F.substring("source", 4, 10).cast("int")
    host = F.concat("source", F.lit(".example.com"))
    rules = (
        hosts.select(
            host.alias("host"),
            F.lit("/private/").alias("path_prefix"),
            F.lit(False).alias("allow"),
        )
        .unionByName(
            hosts.filter(num % 2 == 0).select(
                host.alias("host"),
                F.lit("/private/pub").alias("path_prefix"),
                F.lit(True).alias("allow"),
            )
        )
        .unionByName(
            hosts.filter(num % 3 == 0).select(
                host.alias("host"),
                F.lit("/a/").alias("path_prefix"),
                F.lit(False).alias("allow"),
            )
        )
    )
    return (
        robots_filter(frontier, rules)
        .select("url", "is_allowed", "matched_prefix")
        .orderBy("url")
    )


def anchor_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text profile (operators/links.py
    anchor_text_profile): n_refs / distinct spellings / most-frequent
    spelling (ties → lexicographic min, exact two-agg selection, never
    max_by) for every outlink of the synthetic page corpus — absolute
    targets shared across hosts, root-relative targets per host, an
    empty anchor that must count toward nothing, and a fragment link
    that must not exist at all. The oracle rebuilds the anchor votes
    from the synthesis formula and replays the count/tie algebra."""
    from csv_cruncher_spark.operators import links

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
    )
    t = F.concat(F.lit('<a href="https://t.example.org/p'), (m % 20).cast("string"))
    html = F.concat(
        t, F.lit('">term'), (m % 3).cast("string"), F.lit("</a>"),
        t, F.lit('">term'), (m % 5).cast("string"), F.lit("</a>"),
        F.lit('<a href="/shared">local'), (m % 2).cast("string"), F.lit("</a>"),
        t, F.lit('"></a><a href="#x">nope</a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return links.anchor_text_profile(pages).orderBy("outlink")


def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source (sources/warc.py): compose spec-shaped WARC response
    records from the documents corpus, write them distributed
    (write_warc), and read them back with the split-parallel lineSep
    reader (read_warc) — url, date header, type, byte-exact
    Content-Length, and full payload must survive the round trip. The
    oracle never sees WARC bytes: it constructs the expected frame
    directly from documents (strlen in DuckDB is BYTES — matching
    octet_length), so any composer/parser drift flips the hash."""
    import tempfile

    from csv_cruncher_spark.sources.warc import read_warc, write_warc

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    sec = (m * 37) % 86400
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    pages = docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
        ).alias("url"),
        F.concat(
            F.lit("2026-03-01T"),
            two(F.floor(sec / 3600).cast("long")),
            F.lit(":"),
            two((F.floor(sec / 60) % 60).cast("long")),
            F.lit(":"),
            two(sec % 60),
            F.lit("Z"),
        ).alias("warc_date"),
        F.concat(F.lit("<html><body>"), "text", F.lit("</body></html>")).alias(
            "payload"
        ),
    )
    out_dir = tempfile.mkdtemp(prefix="warc_entry_")
    write_warc(pages, out_dir)
    return (
        read_warc(spark, out_dir)
        .select("url", "warc_date", "warc_type", "content_length", "payload")
        .orderBy("url")
    )


def sitemap_recrawl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parse + recrawl planning (sources/sitemap.py): per-page
    sitemap XML (two <url> blocks: the page with a lastmod, an ?alt
    companion without one) parsed by the JVM-regex extractor, then
    joined against synthesized lake state. Exercises every status:
    doc_id%3==2 pages are claimed-but-unstored (new), %3==1 stored-but-
    unclaimed (unlisted), the rest stale or fresh depending on whether
    the claimed lastmod beats the stored fetch instant ((37·id)%86400
    vs (41·id)%86400 seconds past a fixed UTC day); ?alt urls are
    claim-without-date (new). Epochs compare as absolute instants
    (timestamp_seconds / explicit +00:00 offsets), outputs as int64."""
    from csv_cruncher_spark.sources.sitemap import parse_sitemap, recrawl_plan

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    base = 1772323200  # 2026-03-01T00:00:00Z
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
    )
    sec = (m * 37) % 86400
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    lastmod = F.concat(
        F.lit("2026-03-01T"),
        two(F.floor(sec / 3600).cast("long")),
        F.lit(":"),
        two((F.floor(sec / 60) % 60).cast("long")),
        F.lit(":"),
        two(sec % 60),
        F.lit("+00:00"),
    )
    xml = F.concat(
        F.lit("<urlset><url><loc>"), url,
        F.lit("</loc><lastmod>"), lastmod,
        F.lit("</lastmod></url><url><loc>"), url,
        F.lit("?alt</loc></url></urlset>"),
    )
    sitemap = parse_sitemap(
        docs.filter(m % 3 != 1).select(xml.alias("xml"))
    )
    state = docs.filter(m % 3 != 2).select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(base) + (m * 41) % 86400).alias("warc_ts"),
    )
    plan = recrawl_plan(state, sitemap)
    return plan.select(
        "url",
        "status",
        F.unix_timestamp("fetched_ts").alias("fetched_epoch"),
        F.unix_timestamp("lastmod_ts").alias("lastmod_epoch"),
    ).orderBy("url")


def maintained_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained link graph (lake/links_view.py): a
    pre-state of crawl pages (doc_id % 5 != 0) evolves into a post-state
    (doc_id % 11 == 0 pages deleted, % 5 == 0 pages arrive, % 7 == 0
    pages re-point their hub link to an alt host) — the MAINTAINED path
    (bootstrap edges + ONE keyed-replacement fold over the diff feed,
    only changed pages re-parse) must hash-equal the post state's edge
    list, which the oracle constructs directly from the synthesis
    formula. Edge death on delete, edge replacement on update, and
    new-page edges are all on the path."""
    from csv_cruncher_spark.lake import ivm, links_view

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/a/"), m.cast("string")
    )

    def html(alt_for_7: bool) -> F.Column:
        hub = F.concat(
            F.lit('<a href="https://hub.example.org/d'),
            (m % 50).cast("string"),
            F.lit('">h</a>'),
        )
        alt = F.concat(
            F.lit('<a href="https://alt.example.org/e'),
            (m % 13).cast("string"),
            F.lit('">a</a>'),
        )
        first = F.when(m % 7 == 0, alt).otherwise(hub) if alt_for_7 else hub
        return F.concat(
            first,
            F.lit('<a href="/n/'),
            (m % 9).cast("string"),
            F.lit('">n</a>'),
        )

    pre = docs.filter(m % 5 != 0).select(
        url.alias("url"), html(alt_for_7=False).alias("html")
    )
    post = docs.filter(m % 11 != 0).select(
        url.alias("url"), html(alt_for_7=True).alias("html")
    )
    changes = ivm.diff_states(pre, post, "url")
    out = links_view.apply_links_delta(
        links_view.compute_link_graph(pre), changes
    )
    return out.orderBy("src", "dst")


def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (packing.pack_sequences): documents concatenated
    per shard in doc_id order and cut every 2048 tokens (GPT-style
    pack-then-split; docs may span a boundary). Prefix-scan shape: ONE
    exchange on the shard key, ordered window per shard — parallel
    across shards, deterministic everywhere. Row-level oracle replays
    the identical window math in SQL."""
    docs = _t(spark, sf_dir, "documents")
    out = packing.pack_sequences(
        docs.select(
            "doc_id",
            textstats.regex_token_count("text").alias("n_tok"),
        ),
        "doc_id",
        "n_tok",
        budget=2048,
        n_shards=8,
    )
    return out.select(
        "doc_id", "shard", "start_offset", "first_chunk", "last_chunk"
    ).orderBy("doc_id")


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (joins.interval_join): clicks falling in
    the 30 minutes after an error by the same user. Bucketed equi-join
    on (user_id, time bucket) — plan-pinned not-nested-loop in pytest;
    the naive BETWEEN join is the DuckDB oracle."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("err_end"),
        F.col("event_id").alias("err_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(
        clicks, errors, "ts", "err_ts", "err_end", on=["user_id"],
        bucket_width_s=1800,
    )
    return j.select("event_id", "err_id", "user_id").orderBy("event_id", "err_id")


def token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget quota (ranking.token_budget_filter): walk
    each source's docs in the deterministic epoch-salted draw order and
    keep the greedy prefix whose cumulative regex-token count stays
    within 800 tokens — "at most N tokens per source", the data-mixing
    quota, as a payload-free narrow window + semi-join. Integer costs
    and the md5 draw replay exactly in SQL, so DuckDB reproduces the
    survivor set AND each survivor's running total bit-for-bit."""
    from csv_cruncher_spark.operators import ranking

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn(
        "n_tokens", textstats.regex_token_count("text").cast("long")
    )
    out = ranking.token_budget_filter(
        scored, budget=800, cost_col="n_tokens", id_col="doc_id",
        group_col="source", cum_out="cum_tokens",
    )
    return out.select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    ).orderBy("doc_id")


def embedding_decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination
    (decontam.embedding_contamination_report): corpus vectors within
    cosine 0.25 of any benchmark vector (every 100th embedding as the
    eval set), each with its best-matching benchmark id — the semantic
    screen that catches paraphrased eval leakage n-gram overlap misses.
    Broadcast bench + sequential-fold JVM dot product (the established
    cross-engine-exact cosine form); threshold and arg-max on the RAW
    double (rounding first re-opens the half-up vs half-even boundary
    divergence on a membership gate), round-6 on the reported value only
    — DuckDB replays every pair decision."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 100 == 0)
    rest = emb.filter(F.col("vec_id") % 100 != 0)
    out = decontam.embedding_contamination_report(
        rest, bench, id_col="vec_id", vec_col="embedding", threshold=0.25
    )
    return out.select(
        F.col("id").alias("vec_id"), "bench_id", "max_cosine"
    ).orderBy("vec_id")


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/bpe.bpe_train, Sennrich et al.
    2016): the first 10 merges learned over the documents corpus. The
    corpus is aggregated ONCE into the word-frequency table; every
    round after that is a pair-count aggregation over the bounded
    vocabulary plus one literal-replace projection on the canonical
    doubled-space symbol string — whose left-to-right non-overlapping
    replace semantics are identical in Spark and DuckDB, so the oracle
    replays ALL TEN training rounds (integer pair counts, ASCII
    tie-breaks) bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    from csv_cruncher_spark.operators.bpe import bpe_train

    return bpe_train(docs, "text", n_merges=10).orderBy("merge_rank")


def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law corpus diagnostic (textstats.zipf_fit): least-squares
    slope of ln(tf) vs ln(rank) over the top-100 tokens. Ranks and
    frequencies become integer micro-logs, the normal-equation terms
    accumulate as exact 64-bit integers, and the slope is one double
    division — DuckDB replays the REGRESSION FIT bit-for-bit. The
    corpus-scale work is a single partial-combined word count; the fit
    itself touches 100 rows."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.zipf_fit(docs, "text", top_n=100)


def doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (textstats.tfidf_keywords): top-3
    salient terms per document with idf in integer micro-units
    (round(ln(N/df)·10^6) — the established transcendental-score
    trick), so scores multiply and rank as exact integers and DuckDB
    replays idf, scores, and tie-breaks bit-for-bit. Per-doc top-k is
    one partial-combined collect/sort/slice aggregation bounded by
    per-doc distinct tokens — never a global window."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.tfidf_keywords(docs, "doc_id", "text", k=3)
    return out.orderBy("doc_id", "kw_rank")


def maintained_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained corpus vocabulary (lake/vocab_view.py):
    a pre-state (docs with id % 5 != 0) evolves into a post-state
    (every id % 7 doc gains a token, id % 11 docs are deleted, the
    id % 5 docs arrive) — the MAINTAINED path (bootstrap vocab + one
    token-level retraction/addition fold over the diff feed, the
    Gupta/Mumick counting algorithm one level below the row) must
    hash-equal a from-scratch recompute of the post state, which is
    what the DuckDB oracle performs. Token death, df decrement, and
    exact cancellation of unchanged in-doc counts are all on the path."""
    from csv_cruncher_spark.lake import ivm, vocab_view

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pre = docs.filter(F.col("doc_id") % 5 != 0)
    post = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" extraterm"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    changes = ivm.diff_states(pre, post, "doc_id")
    out = vocab_view.apply_vocab_delta(
        vocab_view.compute_vocab(pre, "doc_id", "text"),
        vocab_view.vocab_delta(changes, "doc_id", "text"),
    )
    return out.select("token", "tf", "df").orderBy("token")


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding (operators/bpe.bpe_encode): every document tokenized
    with the 10 merges bpe_merges learns — per word, the SAME canonical
    doubled-space replace chain training used, as a pure projection
    (k nested literal replaces inside one transform; zero shuffles,
    zero Python). The oracle replays training to round 10 and reads
    each word's FINAL segmentation straight off the vocabulary table —
    converged segmentations agree with the per-word replay for every
    in-vocab word, so text and counts match byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    from csv_cruncher_spark.operators.bpe import bpe_encode, bpe_train

    merges = bpe_train(docs, "text", n_merges=10)
    out = bpe_encode(docs, "doc_id", "text", merges)
    return out.select(
        "doc_id",
        "n_bpe_tokens",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
    ).orderBy("doc_id")


def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-reproducible Lloyd k-means over the embeddings table
    (similarity.kmeans_fit_exact — the oracle twin of the IVF coarse
    quantizer): 8 centroids, 3 full assignment/update rounds, lowest-id
    init. Vectors quantize once to floor-micro integers, distances are
    sequential folds over exact integer-difference squares, and updates
    are order-independent BIGINT sums closed by one double division —
    so DuckDB replays ALL THREE training iterations bit-for-bit
    (iterative algorithms are the class the contract usually concedes
    as rows-only; this one is fully oracled). Per round: one codegen'd
    projection + one n_centroids×dim hash aggregation."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.kmeans_fit_exact(
        emb, "vec_id", "embedding", n_centroids=8, iterations=3
    )
    return out.orderBy("centroid_id", "dim")


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (packing.chunk_documents): every document
    cut into 64-token windows starting every 48 tokens (RoBERTa-style
    overlap so no span is split unseen). Pure projection — sequence +
    posexplode + slice, zero shuffles, chunks inherit the parent's
    partition — so it runs at corpus scale as a map. DuckDB replays the
    identical start grid and slices row-for-row."""
    docs = _t(spark, sf_dir, "documents")
    out = packing.chunk_documents(
        docs, "doc_id", "text", size=64, stride=48
    )
    return out.select(
        "doc_id", "chunk_no", "start_token", "n_chunk_tokens", "chunk_text"
    ).orderBy("doc_id", "chunk_no")


def quality_bucket_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality banding (ranking.quantile_buckets, Wenzek et
    al. 2020 §4.3): per-language head/middle/tail bands on the regex
    token count, cut at the 25th/75th percentile. ONE per-stratum
    array-probability percentile aggregate broadcast back — never a
    window, never NTILE (a rank tercile serializes each language through
    one task; at 100 TB with a handful of languages that's the canonical
    skew trap). Exact-quarter fractions on integer scores make the
    interpolated thresholds (x[i] + {0,.25,.5,.75}·Δ over integers)
    bit-identical in both engines, so band membership is fully oracled."""
    from csv_cruncher_spark.operators import ranking

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn(
        "score", textstats.regex_token_count("text").cast("long")
    )
    out = ranking.quantile_buckets(
        scored, "score", fractions=(0.25, 0.75),
        labels=("tail", "middle", "head"), stratum_col="lang",
    )
    return out.select("doc_id", "lang", "score", "bucket").orderBy("doc_id")


def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher admission gate (textstats.gopher_quality_filter,
    Rae et al. 2021 Table A1): length band, token-shape band, stopword
    floor, repetition caps — one verdict per document plus a fixed-order
    reasons string naming every failed rule (the audit vocabulary a
    groupBy can count rejections over). Two shuffle-light hash
    aggregations + a narrow doc-id join; every rule is a JVM comparison
    on an exact integer-ratio double, so DuckDB reproduces verdicts and
    reason strings byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.gopher_quality_filter(
        docs, "doc_id", "text", min_tokens=40, min_stopword_ratio=0.05,
        max_top_token_frac=0.1, max_dup_bigram_frac=0.4,
    )
    return out.select("doc_id", "n_tokens", "keep", "reasons").orderBy("doc_id")


# ---------------------------------------------------------------- contract --


def _semdedup_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings ∪ planted near-copies (every 50th vector, +0.001 on
    dim 0 — an additive nudge keeps the copy in its source's L2
    neighbourhood, so cluster assignment cannot separate the pair the
    way the rescale used by embedding_near_dup_pairs could). Natural
    max pairwise cosine is ≈0.48, so at threshold 0.95 the duplicate
    set is exactly the planted pairs — deterministic, and the oracle
    replays the construction."""
    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> cast(x as double) + if(i = 0, 0.001d, 0d))"
        ).alias("embedding"),
        "label",
    )
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
        "label",
    ).unionByName(planted)


def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup within-cluster duplicate pairs (operators/semdedup.py,
    Abbas et al. 2023): deterministic seed-centroid clustering + exact
    micro-quantized cosine, fully DuckDB-oracled including the cluster
    assignment itself."""
    both = _semdedup_input(spark, sf_dir)
    pairs = semdedup.semantic_dedup_pairs(
        both, "vec_id", "embedding", threshold=0.95, n_clusters=8
    )
    return pairs.select(
        "a_id", "b_id", "cid", F.round("cosine", 6).alias("cosine")
    ).orderBy("a_id", "b_id")


def semdedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivors — the lowest-id member of each within-cluster
    semantic-duplicate group keeps its row; every planted near-copy is
    dropped."""
    both = _semdedup_input(spark, sf_dir)
    out = semdedup.semantic_dedup(
        both, "vec_id", "embedding", threshold=0.95, n_clusters=8
    )
    return out.select("vec_id", "label").orderBy("vec_id")


def c4_cleaned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 heuristic cleanup (operators/c4.py, Raffel et al. 2020 §2.2)
    over planted multi-line documents: two content lines built from the
    corpus text (terminal punctuation → kept), a too-short line and a
    JavaScript banner (line rules drop them), and lorem-ipsum / curly
    brace poisons on every 13th/17th doc (document rules drop the whole
    doc). Zero-shuffle projection; the oracle replays the construction
    and every predicate."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.substring("text", 1, 40), F.lit(" end of part one.")),
            F.lit("short line"),
            F.lit("Please enable JavaScript to continue viewing."),
            F.concat(F.substring("text", 10, 60), F.lit(" and so it goes!")),
            F.when(F.col("doc_id") % 13 == 0, F.lit("lorem ipsum dolor sit amet.")),
            F.when(F.col("doc_id") % 17 == 0, F.lit("function f() { return 1; }")),
        ).alias("text"),
    )
    out = c4.c4_clean(planted, "doc_id", "text", min_words=5, min_kept_lines=2)
    return out.orderBy("doc_id")


def ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation (operators/recall.py): recall@10 of an
    n_probe=2-of-8 IVF probe against the exact cosine ground truth, per
    query — the operator that turns index hyper-parameters into a
    number. Every stage (assignment, probe choice, both top-k rankings,
    the recall join) is micro-quantized exact and replayed by the
    oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = recall.exact_topk_multi(emb, "vec_id", "embedding", q, "qid", "qvec", k=10)
    approx = recall.ivf_topk_multi(
        emb, "vec_id", "embedding", q, "qid", "qvec", k=10, n_clusters=8, n_probe=2
    )
    return recall.ann_recall(truth, approx).orderBy("query_id")


# classifier entries: the label rule (stopword ratio >= 0.06, i.e.
# standardized x_stop >= 0) splits documents ~56/44 at every SF, so both
# classes are populated and the rule is learnable; 20 iterations at
# lr=1.0 reach ~96% train accuracy with positive weight on x_stop
_CLF_ITERS = 20
_CLF_LR = 1.0


def _clf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csv_cruncher_spark.operators import classifier

    docs = _t(spark, sf_dir, "documents")
    return classifier.micro_feature_frame(docs).withColumn(
        "y", (F.col("x_stop") >= 0).cast("int")
    )


def classifier_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/CCNet-style trained quality classifier
    (operators/classifier.py): batch logistic regression over integer-
    micro text features, TRAINING INCLUDED in the oracle — each of the 8
    gradient iterations is one map-side-combinable aggregation of k+2
    int64 sums (order-independent, so any partitioning yields the same
    weights), and DuckDB replays every iteration as a chained CTE from
    the same generated arithmetic strings. Returns the per-document
    quantized probability and the >=0.5 keep decision — the
    classifier-filtered-corpus pattern. Per iteration nothing shuffles:
    partial aggs move k+2 longs per partition."""
    from csv_cruncher_spark.operators import classifier

    feats = _clf_features(spark, sf_dir).persist()
    w = classifier.train_logreg(feats, "y", iters=_CLF_ITERS, lr=_CLF_LR)
    p = classifier.score_micro(w)
    return feats.select(
        "doc_id",
        "y",
        p.alias("p_micro"),
        (p >= 500_000).cast("int").alias("pred"),
    ).orderBy("doc_id")


def classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned weight vector itself — the training artifact, oracled
    bit-for-bit (DuckDB reruns all 8 iterations and must land on the
    same doubles; the 9dp comparison would surface any engine
    divergence in the gradient arithmetic). Weights are O(k) driver
    scalars by design (the classic distributed-GD layout), so building
    the 4-row result frame on the driver is the honest shape."""
    from csv_cruncher_spark.operators import classifier

    feats = _clf_features(spark, sf_dir).persist()
    w = classifier.train_logreg(feats, "y", iters=_CLF_ITERS, lr=_CLF_LR)
    names = ("bias",) + classifier.DEFAULT_FEATURES
    return spark.createDataFrame(
        [(j, names[j], float(wj)) for j, wj in enumerate(w)],
        "j INT, feature STRING, weight DOUBLE",
    ).orderBy("j")


def source_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit (lake/salt.key_skew_report): top-20 sources with exact
    counts, per-key share, and cumulative share in micro units — the
    report that drives salting/bucketing decisions ("top 3 domains hold
    80% of rows"). Counts pre-combine map-side; the rank/cumsum window
    runs on the already-limited 20 rows, never corpus-wide; shares are
    single rounded divisions by the exact total, replayed bit-for-bit
    by DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return salt.key_skew_report(docs, "source", top_k=20).orderBy("rank")


def ivm_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained MIN/MAX (ivm.apply_changes_to_minmax):
    per-event_type extremum cents over the LWW user state, bootstrapped
    from a 3/4 subset and folded forward by the NET pre-image feed —
    insertions self-maintain via least/greatest; retractions that touch
    a stored extremum re-aggregate ONLY the endangered groups through a
    semi-join on the post state (the rescan is explicit in the API, not
    a hidden table scan). The oracle recomputes from the FULL final
    state, so fold, endangered detection, group birth/death, and the
    all-null-survivors case all gate the value hash. Extrema are
    order-independent, so maintained == recompute bit-for-bit even on
    unquantized measures."""
    ev = _t(spark, sf_dir, "events")

    def state(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "value"), F.struct("ts", "event_id")
                ).alias("_l")
            )
            .select(
                "user_id",
                F.col("_l.event_type").alias("event_type"),
                F.round(F.col("_l.value") * 100).cast("long").alias("value_cents"),
            )
        )

    pre = state(ev.filter(F.col("event_id") % 4 != 0))
    post = state(ev)
    group = ["event_type"]
    mins, maxs = {"min_cents": "value_cents"}, {"max_cents": "value_cents"}
    maintained = ivm.apply_changes_to_minmax(
        ivm.compute_minmax(pre, group, mins=mins, maxs=maxs, count_col="n_users"),
        ivm.diff_states(pre, post, "user_id"),
        post,
        group,
        mins=mins,
        maxs=maxs,
        count_col="n_users",
    )
    return maintained.select(
        "event_type", "n_users", "min_cents", "max_cents"
    ).orderBy("event_type")


def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift (textstats.corpus_drift): KL
    divergence of each source's unigram mix from the whole corpus —
    CCNet's per-shard canary for scraper regressions and boilerplate
    floods. Both log-probabilities are once-rounded integer micro-nats,
    the per-group sum is exact int64, and ``kl_micro`` is its single
    terminal division — bit-replayed by DuckDB. One (group, token)
    hash agg + a vocabulary-keyed equi-join; no unbounded broadcast."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.corpus_drift(docs, "source", "text")
    return out.orderBy("source")


def grouped_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-level dataset split (sampling.assign_split
    keyed on ``source``): every document of a source lands in the same
    split, so near-duplicates within a domain can never straddle
    train/test — the split-by-group discipline eval-contamination
    audits demand. Reports per split the exact source and document
    counts; the oracle replays the md5 threshold math per source and
    must land on identical partitions."""
    docs = _t(spark, sf_dir, "documents")
    split = sampling.assign_split(
        docs, "source", {"train": 8, "val": 1, "test": 1}, salt="gsplit-v1"
    )
    return (
        split.groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("split")
    )


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement
    (sampling.weighted_sample_topk): the 50 documents winning the
    token-count-weighted lottery under the salted md5 stream. The E-S
    key ln(u)/w uses a once-rounded integer-micro ln(u) and ONE IEEE
    division, so the selected set, order, and the key doubles replay
    bit-for-bit in DuckDB. Plan: narrow projection + TakeOrdered
    (per-partition k-heaps — no global sort shuffle)."""
    from csv_cruncher_spark.operators.sampling import weighted_sample_topk

    docs = _t(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        "lang",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("long")
        .alias("weight"),
    )
    out = weighted_sample_topk(weighted, "doc_id", "weight", 50, key_out="es_key")
    return out.orderBy(F.desc("es_key"), "doc_id")


def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set evaluation of the quality classifier
    (classifier.evaluate): ONE row of exact int64 confusion counts plus
    accuracy/precision/recall/F1 in micro units, each a single rounded
    division of two exact sums (F1 via the harmonic identity — no
    rounded intermediate feeds another division). The oracle retrains
    all iterations in DuckDB, rescores, and must land on the identical
    nine integers. One partial-combined aggregation — four longs per
    partition cross the wire."""
    from csv_cruncher_spark.operators import classifier

    feats = _clf_features(spark, sf_dir).persist()
    w = classifier.train_logreg(feats, "y", iters=_CLF_ITERS, lr=_CLF_LR)
    p = classifier.score_micro(w)
    scored = feats.select("y", (p >= 500_000).cast("int").alias("pred"))
    return classifier.evaluate(scored)


def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the trained classifier
    (classifier.calibration_bins): decile bins of the quantized
    probability with per-bin count, mean predicted probability,
    empirical positive rate, and their exact integer gap. Binning is
    int64 floor division (`div`/`//` — never a double->int cast, whose
    rounding differs across engines); the per-bin ratios are single
    rounded divisions. One ≤10-group hash agg."""
    from csv_cruncher_spark.operators import classifier

    feats = _clf_features(spark, sf_dir).persist()
    w = classifier.train_logreg(feats, "y", iters=_CLF_ITERS, lr=_CLF_LR)
    scored = feats.select("y", classifier.score_micro(w).alias("p_micro"))
    return classifier.calibration_bins(scored).orderBy("bin")


# BM25 retrieval: the query workload is a fixed literal set (a query
# surface, not data) — both engines rank the same corpus for the same
# four queries
_BM25_QUERIES = [
    ("q1", "spark window merge"),
    ("q2", "customer filter order"),
    ("q3", "hash join agg"),
    ("q4", "vector stream scan"),
]
_BM25_K = 5


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25 top-k retrieval (operators/retrieval.py): Okapi
    scoring with Lucene-form idf in integer micro-units and the
    rational k1=6/5, b=3/4 algebra multiplied through to EXACT int64
    numerator/denominator pairs — each per-(query, doc, token) term is
    one shared-SQL-string double divide+multiply then a single
    rounding, summed as int64, so ranking is pure integer comparison
    and DuckDB replays scores and tie-breaks bit-for-bit. Query tokens
    broadcast; df/idf aggregate only over the matched slice of the
    inverted index; per-query top-k is a bounded sort/slice partial
    aggregation, never a corpus-wide window."""
    from csv_cruncher_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        _BM25_QUERIES, "query_id STRING, query_text STRING"
    )
    out = retrieval.bm25_topk(docs, "doc_id", "text", q, k=_BM25_K)
    return out.orderBy("query_id", "rank")


def crawl_frontier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer-micro PageRank over the deterministic md5
    pseudo link graph (operators/graph.py pagerank_micro): crawl-frontier
    prioritization for the CDC web-ingest pipeline. All arithmetic is
    int64 (rank div out_degree contributions, damped sum div 100), so
    the DuckDB oracle unrolls the same 3 iterations bit-for-bit. Top 50
    by (rank_micro DESC, doc_id ASC) — a unique ordering."""
    from csv_cruncher_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    ranks = graph.pagerank_micro(
        docs, "doc_id", out_degree=3, iterations=3, damping_pct=85
    )
    return (
        ranks.select(F.col("node").alias("doc_id"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), F.col("doc_id").asc())
        .limit(50)
    )


def hub_authority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer-micro HITS over the deterministic md5
    pseudo link graph (operators/graph.py hits_micro): hubs are pages
    worth re-crawling for their outlinks, authorities are pages worth
    ingesting — the two crawl signals PageRank conflates. All arithmetic
    is int64 (sum propagation, ceil-scaled-max normalization via integer
    division), so the DuckDB oracle unrolls the same 2 iterations
    bit-for-bit. Top 50 by (auth_micro DESC, hub_micro DESC, doc_id ASC)
    — a unique ordering."""
    from csv_cruncher_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    scores = graph.hits_micro(docs, "doc_id", out_degree=3, iterations=2)
    return (
        scores.select(F.col("node").alias("doc_id"), "hub_micro", "auth_micro")
        .orderBy(
            F.col("auth_micro").desc(), F.col("hub_micro").desc(), F.col("doc_id")
        )
        .limit(50)
    )


def crawl_depth_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS crawl depth (operators/graph.py bfs_depth): hop
    distance of every page from the seed set (doc_id % 41 == 0) over
    the deterministic md5 pseudo link graph, capped at 3 rounds — the
    depth-budget signal depth-limited crawlers (Heritrix max-hops)
    schedule by, NULL for pages beyond the horizon. Each round joins
    ONLY the previous frontier against the edge list (O(frontier
    out-edges), never O(E)); all values are exact integers, so the
    DuckDB oracle unrolls the same candidate/new/reached rounds
    bit-for-bit, NOT-EXISTS replaying the left-anti joins."""
    from csv_cruncher_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.select(F.col("doc_id").alias("seed")).where(
        F.col("doc_id") % 41 == 0
    )
    depths = graph.bfs_depth(
        docs, "doc_id", out_degree=3, max_rounds=3, seeds=seeds
    )
    return depths.select(F.col("node").alias("doc_id"), "depth").orderBy(
        F.asc_nulls_last("depth"), F.col("doc_id")
    )


def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs |A∩B| / min(|A|,|B|) over distinct
    3-shingles (operators/dedup.py ngram_containment_pairs) — catches
    quote/template inclusion near-dups Jaccard's union denominator
    dilutes. Exact integer set sizes; ratio rounded 6dp on both sides."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_containment_pairs(
        docs, "doc_id", "text", min_containment=0.5
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round("containment", 6).alias("containment"),
        "n_a",
        "n_b",
    ).orderBy("id_a", "id_b")


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty per document (operators/dedup.py
    novelty_scores): fraction of a doc's distinct 3-shingles whose
    minimum owning doc_id is this doc — the marginal-content curve of
    the corpus in ingestion order. Exact integers; ratio rounded 6dp on
    both sides; empty docs keep NULL novelty."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.novelty_scores(docs, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_shingles",
        "n_novel",
        F.round("novelty", 6).alias("novelty"),
    ).orderBy("doc_id")


def pmi_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-pair collocations by pointwise mutual information
    (operators/textstats.py pmi_collocations), min_count=5 floor against
    hapax-pair noise; the micro-quantized ln formula text is mirrored
    verbatim in the oracle so the doubles agree bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.pmi_collocations(docs, "text", min_count=5, top_k=100)


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + probe (operators/sketch.py): estimate
    the corpus's top-20 exact token counts through a 4×1024 sketch and
    ship (tok, exact_count, est_count) side by side — est ≥ exact always
    (one-sided CMS error), equality when the cell is collision-free.
    Bucket hash is the portable md5-prefix mod, counters are int64 SUMs,
    so the DuckDB oracle replays build AND probe bit-for-bit."""
    from csv_cruncher_spark.operators import sketch as cms

    docs = _t(spark, sf_dir, "documents")
    sk = cms.count_min_build(docs, "text", depth=4, width=1024)
    exact = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("tok")).limit(20)
    est = cms.count_min_estimate(sk, top.select("tok"), "tok", depth=4, width=1024)
    return (
        top.join(est, "tok")
        .select("tok", "exact_count", "est_count")
        .orderBy(F.desc("exact_count"), F.asc("tok"))
    )


def personalized_crawl_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed set (operators/graph.py
    pagerank_micro(seeds=...)): teleport mass lands only on seeds
    (doc_id % 50 == 0 — a deterministic 2% seed set), so rank
    concentrates in the seeds' link neighbourhood — the focused-crawl
    frontier scorer. Same int64 micro arithmetic; the oracle unrolls the
    3 iterations with the seed CASE inline."""
    from csv_cruncher_spark.operators import graph

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    ranks = graph.pagerank_micro(
        docs, "doc_id", out_degree=3, iterations=3, damping_pct=85, seeds=seeds
    )
    return (
        ranks.select(F.col("node").alias("doc_id"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), F.col("doc_id").asc())
        .limit(50)
    )


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source (operators/sketch.py
    hll_build/hll_estimate) next to the exact countDistinct: 1024
    registers per group regardless of vocabulary size — the cardinality
    companion to cms_token_counts. Registers (present/zeros/z_scaled)
    are exact int64s the DuckDB oracle replays bit-for-bit via the
    shared hll_oracle_sql fragment; est_distinct mirrors the double
    formula text verbatim."""
    from csv_cruncher_spark.operators import sketch as sk_mod

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    sk = sk_mod.hll_build(toks, "tok", m=1024, group_cols=("source",))
    est = sk_mod.hll_estimate(sk, m=1024, group_cols=("source",))
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return (
        exact.join(est, "source")
        .select(
            "source", "exact_distinct", "present", "zeros", "z_scaled",
            "est_distinct",
        )
        .orderBy("source")
    )


def crawl_schedule_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness crawl scheduling (operators/crawl.py crawl_schedule):
    every frontier URL gets a fetch slot with ≤25 fetches per host per
    slot, priority-first — computed skew-safely (narrow projection,
    per-(host, priority) count + cumulative offset + tie-class window,
    join-back by id) yet bit-equal to the oracle's plain ROW_NUMBER."""
    from csv_cruncher_spark.operators import crawl

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        "doc_id",
        F.col("source").alias("host"),
        F.col("n_chars").cast("double").alias("prio"),
    )
    out = crawl.crawl_schedule(frontier, "host", "prio", "doc_id",
                               per_host_budget=25)
    return out.select("doc_id", "host", "rank_in_host", "slot").orderBy(
        "host", "rank_in_host"
    )


def focused_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole focused-crawl loop in one call
    (operators/crawl.py focused_crawl_plan): personalized PageRank from
    the 2% seed set scores the frontier, politeness scheduling
    dispatches it (10 fetches per host per slot, rank-first). One
    composition, one oracle: the unrolled 3-iteration seed-CASE chain
    of personalized_crawl_rank feeding crawl_schedule_slots' plain
    ROW_NUMBER."""
    from csv_cruncher_spark.operators import crawl

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    plan = crawl.focused_crawl_plan(
        docs.select("doc_id", F.col("source").alias("host")),
        "doc_id",
        "host",
        seeds,
        iterations=3,
        per_host_budget=10,
    )
    return plan.select(
        "doc_id", "host", "rank_micro", "rank_in_host", "slot"
    ).orderBy("host", "rank_in_host")


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy in integer micro-nats
    (operators/textstats.py char_entropy): H = ln(n) − (Σ c·ln c)/n with
    each char-class term quantized to int64 BEFORE the sum (order-
    independent), the pmi_collocations cross-engine discipline. Low
    entropy flags padding/repeated-glyph pages, high entropy flags
    binary junk — a cheap quality signal next to doc_quality and
    doc_repetition_stats. NULL/empty text keeps its row (NULL entropy)."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.char_entropy(docs, "doc_id", "text")


def url_blocklist_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist crawl screening (operators/urlfilter.py
    blocklist_filter): every doc gets TWO url spellings (www. and a
    deep cdn.static. subdomain) and a 3-entry blocklist must block the
    src3 subtree via registrable-suffix match, the cdn host of src7
    exactly, and nothing via the never-matching entry. Label-boundary
    suffix semantics: the oracle states the SAME predicate as
    host = d OR host LIKE '%.' || d. Zero-shuffle literal path (the
    blocklist is config-scale); the DataFrame broadcast-join path is
    asserted equal in tests."""
    docs = _t(spark, sf_dir, "documents")
    u1 = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
    )
    u2 = F.concat(
        F.lit("https://cdn.static."), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
    )
    urls = docs.select("doc_id", F.explode(F.array(u1, u2)).alias("url"))
    blocked = ["src3.example.com", "cdn.static.src7.example.com", "badhost.test"]
    return (
        urlfilter.blocklist_filter(urls, "url", blocked, keep="flag")
        .select(
            "doc_id", "url", F.col("blocked").cast("long").alias("is_blocked")
        )
        .orderBy("doc_id", "url")
    )


def _mirror_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-host crawl of the documents corpus: one
    primary host per source serving every doc, a full mirror host
    ('m.' prefix) re-serving the even docs byte-identically, and a
    partial re-host ('p.' prefix) serving doc_id%4==0 verbatim plus its
    own unique pages — the three host relationships a mirror report
    must separate (full mirror, partial re-host, unrelated)."""
    docs = _t(spark, sf_dir, "documents")
    primary = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"), "text"
    )
    mirror = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("m."), "source", F.lit(".example.com")).alias("host"),
        "text",
    )
    partial_shared = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("p."), "source", F.lit(".example.com")).alias("host"),
        "text",
    )
    partial_own = docs.filter(F.col("doc_id") % 4 == 1).select(
        F.concat(F.lit("p."), "source", F.lit(".example.com")).alias("host"),
        F.concat("text", F.lit(" [p-extra]")).alias("text"),
    )
    return primary.unionByName(mirror).unionByName(partial_shared).unionByName(
        partial_own
    )


def host_mirror_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-pair mirror detection over a deterministic multi-host crawl
    (operators/mirrors.py host_mirror_pairs): distinct content
    fingerprints per host, fp equi-join with a stop-fingerprint cap,
    exact integer containment micro-ratio. The full mirror hosts land
    at containment 1e6; the partial re-hosts land wherever the corpus's
    own duplicate texts put them — the oracle replays the identical
    md5 + floor arithmetic so a drift in either the screen or the ratio
    flips the hash."""
    from csv_cruncher_spark.operators.mirrors import host_mirror_pairs

    pages = _mirror_pages(spark, sf_dir)
    return host_mirror_pairs(
        pages, "host", "text", min_shared=2, min_containment_micro=500_000
    ).orderBy("host_a", "host_b")


def crawler_trap_report_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL-space vs content-diversity report
    (operators/mirrors.py crawler_trap_report): a synthetic trap host
    multiplies every fifth doc into 4 parameterized URLs over a 3-page
    content set (the calendar/faceted-nav signature) next to the normal
    one-URL-per-doc source hosts; ONE host aggregation flags it. The
    normal hosts' dup ratios are whatever the corpus's own duplicate
    texts make them — oracled, not assumed."""
    from csv_cruncher_spark.operators.mirrors import crawler_trap_report

    return crawler_trap_report(
        _trap_pages(spark, sf_dir), "host", "url", "text",
        min_urls=10, min_dup_ratio_micro=500_000,
    ).orderBy("host")


def recrawl_rate_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cho & Garcia-Molina change-rate estimation over a deterministic
    revisit history (operators/crawl.py change_rate_estimates): every
    url is fetched 4 times at a per-url cadence (1-3 h), changes after
    the first fetch decided by an md5 coin both engines can flip
    (`substr(md5(url:k),1,1) <= '7'`). The estimator's one ln is
    quantized ONCE to int64 micro-nats (the pmi/entropy discipline);
    the recrawl priority (expected changes/day) is exact integer
    arithmetic after it — full value-hash oracle on an 'approximate'
    statistics operator."""
    from csv_cruncher_spark.operators.crawl import change_rate_estimates

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    k = F.explode(F.array([F.lit(i) for i in range(4)])).alias("k")
    visits = docs.select(url.alias("url"), "doc_id", k).select(
        "url",
        (
            F.lit(1_700_000_000)
            + F.col("k") * 3600 * (1 + F.col("doc_id") % 3)
        ).cast("long").alias("ts"),
        F.when(F.col("k") == 0, F.lit(False)).otherwise(
            F.substring(
                F.md5(
                    F.concat("url", F.lit(":"), F.col("k").cast("string"))
                ),
                1,
                1,
            )
            <= "7"
        ).alias("changed"),
    )
    return change_rate_estimates(visits, "url", "ts", "changed").orderBy("url")


def _trap_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawler_trap_report entry's deterministic crawl: normal
    one-URL-per-doc source hosts plus a trap host that multiplies every
    fifth doc into 4 parameterized URLs over a 3-page content set."""
    docs = _t(spark, sf_dir, "documents")
    normal = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    k = F.explode(F.array([F.lit(i) for i in range(4)])).alias("k")
    trap = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", k)
        .select(
            F.lit("trap.example.com").alias("host"),
            F.concat(
                F.lit("https://trap.example.com/list?session="),
                F.col("doc_id").cast("string"),
                F.lit("&page="),
                F.col("k").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("trap page "), (F.col("doc_id") % 3).cast("string")
            ).alias("text"),
        )
    )
    return normal.unionByName(trap)


def trap_aware_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trap → politeness loop closed in one call
    (operators/crawl.py trap_aware_schedule): the crawler-trap report
    over the already-crawled pages throttles the flagged host to 1
    fetch per slot while everyone else keeps the default budget, then
    the skew-safe decomposed schedule dispatches the frontier. The
    oracle replays the WHOLE composition — report, CASE budget,
    broadcast join, plain ROW_NUMBER, per-row floor division — so a
    drift in any stage flips the hash."""
    from csv_cruncher_spark.operators.crawl import trap_aware_schedule

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.col("doc_id").alias("url_id"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("trap.example.com")
        ).otherwise(F.concat("source", F.lit(".example.com"))).alias("host"),
        ((F.col("doc_id") * 37) % 91).cast("long").alias("prio"),
    )
    out = trap_aware_schedule(
        frontier, "host", "prio", "url_id",
        _trap_pages(spark, sf_dir), "host", "url", "text",
        per_host_budget=5, trap_budget=1,
        min_urls=10, min_dup_ratio_micro=500_000,
    )
    return out.select(
        "url_id", "host", "prio", "host_budget", "rank_in_host", "slot"
    ).orderBy("url_id")


def canonical_url_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed canonical-URL election
    (operators/mirrors.py canonical_url_election): every doc is served
    under 2-3 genuinely different spellings (base, 'm.' mirror host,
    '?utm_source=feed' tracking variant on even docs); per content
    fingerprint the SHORTEST spelling (ties lexicographic) wins — one
    min-struct aggregation + one fp equi-join, payload-free. The oracle
    replays the election with a plain ROW_NUMBER over
    (length(url), url), so ordering drift in either engine flips the
    hash. Corpus texts that repeat across doc_ids merge groups across
    hosts — replayed, not assumed."""
    from csv_cruncher_spark.operators.mirrors import canonical_url_election

    docs = _t(spark, sf_dir, "documents")
    base = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    pages = (
        docs.select(base.alias("url"), "text")
        .unionByName(
            docs.select(
                F.concat(
                    F.lit("https://m."), "source", F.lit(".example.com/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                "text",
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 2 == 0).select(
                F.concat(base, F.lit("?utm_source=feed")).alias("url"), "text"
            )
        )
    )
    return canonical_url_election(pages, "url", "text").orderBy(
        "url", "canonical_url"
    )


def url_param_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-parameter profiling for URL canonicalization
    (operators/urlfilter.py url_param_profile): every doc URL carries a
    per-doc-unique 'sid' (the session-id signature: distinct ratio 1e6,
    flagged), a low-cardinality 'lang' and a 7-value 'page' (stable
    facets, not flagged). The Spark side PARSES the URLs with the
    operator's JVM regexes; the oracle never parses — it constructs the
    (host, param, value) triples independently from the synthesis
    formula, so a parsing bug cannot hide (the page_outlinks
    discipline)."""
    from csv_cruncher_spark.operators.urlfilter import url_param_profile

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/a?sid="),
            F.col("doc_id").cast("string"),
            F.lit("&lang="), "lang",
            F.lit("&page="), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    return url_param_profile(
        urls, "host", "url", min_occurrences=5,
        session_threshold_micro=900_000,
    ).orderBy("host", "param")


def mirror_host_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror CLUSTERS, not just pairs: host_mirror_pairs feeds the
    dedup layer's pointer-halving connected components
    (operators/dedup.py connected_components — the same O(log diameter)
    min-label engine the document dup-groups use, here on host-string
    vertices), so a chain primary↔mirror↔re-host collapses into one
    cluster keyed by its lexicographically-smallest host. Singleton
    hosts keep their own cluster via the explicit vertex frame. The
    oracle replays reachability with a recursive CTE over the SAME
    edge construction."""
    from csv_cruncher_spark.operators.dedup import connected_components
    from csv_cruncher_spark.operators.mirrors import host_mirror_pairs

    pages = _mirror_pages(spark, sf_dir)
    pairs = host_mirror_pairs(
        pages, "host", "text", min_shared=2, min_containment_micro=500_000
    )
    verts = pages.filter(F.col("text").isNotNull()).select("host").distinct()
    cc = connected_components(pairs, vertices=verts, id_a="host_a", id_b="host_b")
    return cc.select(
        F.col("id").alias("host"), F.col("group_id").alias("cluster_id")
    ).orderBy("host")


def canonicalized_trap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call URL canonicalization over a synthesized crawl
    (operators/urlfilter.py canonicalize_by_profile): every doc URL
    carries a per-doc-unique 'sid' plus stable 'lang'/'page' facets;
    the mined profile flags 'sid' ONLY (25 occurrences per host, ratio
    1e6 vs <=280000 for the facets) and the zero-shuffle literal
    rewrite strips it. The oracle CONSTRUCTS the expected canonical URL
    independently from the synthesis formula — it never profiles or
    parses — so a wrong flag on lang/page or a byte drift in the
    rewrite flips the hash (the page_outlinks discipline)."""
    from csv_cruncher_spark.operators.urlfilter import canonicalize_by_profile

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/a?sid="),
            F.col("doc_id").cast("string"),
            F.lit("&lang="), "lang",
            F.lit("&page="), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    return canonicalize_by_profile(
        urls, "host", "url", min_occurrences=5,
        session_threshold_micro=900_000,
    ).select("host", "url", "canonical_url").orderBy("url")


def adaptive_recrawl_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch history → prioritized politeness-bounded recrawl schedule
    in ONE call (operators/crawl.py adaptive_recrawl_plan): the Cho &
    Garcia-Molina rate estimate ages into expected-changes-since-last-
    fetch (exact int64 after the one quantized ln), then the skew-safe
    decomposed rank dispatches per-host slots. Same deterministic
    4-visit history as recrawl_rate_estimates; the oracle replays every
    stage — estimator, aging, ROW_NUMBER, floor division — so drift
    anywhere in the composition flips the hash."""
    from csv_cruncher_spark.operators.crawl import adaptive_recrawl_plan

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    k = F.explode(F.array([F.lit(i) for i in range(4)])).alias("k")
    visits = docs.select(url.alias("url"), "doc_id", k).select(
        "url",
        (
            F.lit(1_700_000_000)
            + F.col("k") * 3600 * (1 + F.col("doc_id") % 3)
        ).cast("long").alias("ts"),
        F.when(F.col("k") == 0, F.lit(False)).otherwise(
            F.substring(
                F.md5(
                    F.concat("url", F.lit(":"), F.col("k").cast("string"))
                ),
                1,
                1,
            )
            <= "7"
        ).alias("changed"),
    )
    out = adaptive_recrawl_plan(
        visits, "url", "ts", "changed",
        now_ts=1_700_100_000, per_host_budget=7,
    )
    return out.select(
        "url", "host", "last_fetch_ts", "age_s", "changes_per_day_micro",
        "expected_changes_micro", "rank_in_host", "slot",
    ).orderBy("url")


def soft_error_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (operators/mirrors.py soft_error_report):
    docs with doc_id%7==0 serve the host's '404 not found' template and
    doc_id%7==1 its 'Access denied' template instead of real content
    (7 is coprime with the corpus's 20-source doc_id stride, so every
    host gets a 3-4-URL slice of each template among its 25 URLs) —
    two SHORT texts each holding 12-16% of the host's URL space get
    flagged; the long real texts (even corpus-duplicated ones) don't.
    The oracle replays the whole report — md5 grouping, distinct-URL
    counts, host totals, the share floor-division and the three-gate
    flag — so any drift flips the hash."""
    from csv_cruncher_spark.operators.mirrors import soft_error_report

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat("source", F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("404 not found"))
        .when(F.col("doc_id") % 7 == 1, F.lit("Access denied"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return soft_error_report(
        pages, "host", "url", "text",
        min_urls=3, min_share_micro=100_000, max_text_len=64,
    ).orderBy("host", "fp")


def fetch_retry_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry/backoff planning over a deterministic fetch log
    (operators/crawl.py fetch_retry_plan): every url is fetched 5 times
    hourly, success decided by an md5 coin both engines can flip
    (substr(md5(url:k),1,1) <= 'b', ~69% ok) — yielding a natural mix
    of healthy / retry / dead urls. The oracle replays the trailing-
    failure-streak formulation (count of fetches after the last
    success) and the capped exponential backoff with exact integer
    arithmetic, so a drift in streak counting, state classification, or
    the 2^(streak-1) delay flips the hash."""
    from csv_cruncher_spark.operators.crawl import fetch_retry_plan

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    k = F.explode(F.array([F.lit(i) for i in range(5)])).alias("k")
    log = docs.select(url.alias("url"), k).select(
        "url",
        (F.lit(1_700_000_000) + F.col("k") * 3600).cast("long").alias("ts"),
        (
            F.substring(
                F.md5(
                    F.concat("url", F.lit(":"), F.col("k").cast("string"))
                ),
                1,
                1,
            )
            <= "b"
        ).alias("ok"),
    )
    return fetch_retry_plan(
        log, "url", "ts", "ok",
        max_attempts=3, base_delay_s=600, max_delay_s=1800,
    ).select(
        "url", "n_fetches", "last_ts", "last_ok", "last_success_ts",
        "fail_streak", "state", "next_retry_ts",
    ).orderBy("url")


def cdx_capture_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index over a synthesized crawl (sources/warc.py
    cdx_index + functions/urls.py surt_key): every doc captured once at
    a www-spelled url with a query facet. The Spark side PARSES urls
    into SURT form with the operator's JVM expressions; the oracle
    never parses — it CONSTRUCTS the expected surt string directly from
    the synthesis formula ('com,example,' || source || ')/...', www
    stripped, labels reversed), so a parsing or reversal bug cannot
    hide. digest/length replay as md5/strlen byte-exact."""
    from csv_cruncher_spark.sources.warc import cdx_index

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://www."), "source", F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="), (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
        (F.lit(1_700_000_000) + F.col("doc_id")).cast("long").alias("warc_ts"),
        F.col("text").alias("payload"),
    )
    return cdx_index(pages).orderBy("surt", "ts")


def host_url_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level URL-space churn between two crawl snapshots
    (operators/snapshot.py url_churn_report): the new snapshot loses
    doc_id%7==0 urls and gains fresh /n-prefixed urls for doc_id%3==0
    (both strides coprime with the 20-source doc_id layout, so every
    host mixes kept/added/removed). The Spark side is the join-free
    tag-sum formulation; the oracle DELIBERATELY replays it as the
    classic FULL OUTER JOIN — two different algorithms, one answer, so
    a tagging or rollup bug cannot agree by construction."""
    from csv_cruncher_spark.operators.snapshot import url_churn_report

    docs = _t(spark, sf_dir, "documents")
    host = F.concat("source", F.lit(".example.com"))
    base = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"),
        F.col("doc_id").cast("string"),
    )
    old = docs.select(host.alias("host"), base.alias("url"))
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        host.alias("host"), base.alias("url")
    ).unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            host.alias("host"),
            F.concat(
                F.lit("https://"), "source", F.lit(".example.com/n"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
    )
    return url_churn_report(old, new, "host", "url").orderBy("host")


def host_rate_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness compliance audit (operators/crawl.py host_rate_audit):
    a deterministic fetch log (one fetch per doc plus a 7-seconds-later
    refetch for doc_id%3==0) graded against a 1-fetch-per-60s-window
    cap on the fixed grid. The oracle replays the two-level window
    aggregation and the excess arithmetic exactly."""
    from csv_cruncher_spark.operators.crawl import host_rate_audit

    docs = _t(spark, sf_dir, "documents")
    host = F.concat("source", F.lit(".example.com"))
    log = docs.select(
        host.alias("host"),
        (F.lit(1_700_000_000) + F.col("doc_id")).cast("long").alias("ts"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            host.alias("host"),
            (F.lit(1_700_000_000) + F.col("doc_id") + 7).cast("long")
            .alias("ts"),
        )
    )
    return host_rate_audit(
        log, "host", "ts", window_s=60, max_per_window=1
    ).orderBy("host")


def crawl_plan_etas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan → timeline composition (operators/crawl.py crawl_schedule +
    schedule_eta): the skew-safe decomposed rank dispatches the
    frontier into slots, then each host's robots Crawl-delay (30s for
    hosts whose source label ends in '1', default 5s) converts slots
    into fetch instants via one broadcast join + projection. Oracle
    replays ROW_NUMBER, the CASE delay, and the eta arithmetic."""
    from csv_cruncher_spark.operators.crawl import crawl_schedule, schedule_eta

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.col("doc_id").alias("url_id"),
        F.concat("source", F.lit(".example.com")).alias("host"),
        ((F.col("doc_id") * 37) % 91).cast("long").alias("prio"),
    )
    sched = crawl_schedule(frontier, "host", "prio", "url_id",
                           per_host_budget=4)
    delays = (
        frontier.select("host").distinct()
        .filter(F.col("host").endswith("1.example.com"))
        .withColumn("delay_s", F.lit(30).cast("long"))
    )
    out = schedule_eta(sched, "host", delays=delays,
                       default_delay_s=5, t0=1_700_000_000)
    return out.select(
        "url_id", "host", "prio", "rank_in_host", "slot", "delay_s",
        "eta_ts",
    ).orderBy("url_id")


def host_entropy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level content-quality rollup for crawl budgeting: the
    per-doc integer-micro character entropy (textstats.char_entropy,
    already oracled doc-level in doc_char_entropy) aggregated per host
    — n_docs, total chars, mean/min/max entropy and the count of
    low-entropy (< 2.0 nats) repeated-glyph suspects. Because each
    doc's entropy_micro is bit-identical across engines, the host
    rollup stays exact int64 end-to-end; the oracle re-derives the doc
    entropies from scratch and replays the rollup."""
    docs = _t(spark, sf_dir, "documents")
    ent = textstats.char_entropy(docs, "doc_id", "text")
    joined = docs.select(
        "doc_id", F.concat("source", F.lit(".example.com")).alias("host")
    ).join(ent, "doc_id")
    return joined.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.floor(
            F.sum("entropy_micro") / F.count("entropy_micro")
        ).cast("bigint").alias("mean_entropy_micro"),
        F.min("entropy_micro").alias("min_entropy_micro"),
        F.max("entropy_micro").alias("max_entropy_micro"),
        F.count(F.when(F.col("entropy_micro") < 2_000_000, 1)).alias(
            "n_low_entropy"
        ),
    ).orderBy("host")


def scd2_url_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 page history (operators/scd.py scd2_history): the
    CDC change stream materialized as versioned ``[valid_from,
    valid_to)`` intervals instead of LWW current state. The synthesized
    log exercises every path — duplicate (url, ts) writers (LWW by
    row_idx), byte-identical re-fetches (collapsed into the open
    interval), edits, deletes (mid-timeline gaps), and re-inserts after
    delete. The oracle replays the whole kernel (LWW dedup → null-safe
    collapse grouping → interval lead → delete filter) in window SQL,
    so a wrong winner, a split interval, or a surviving tombstone all
    flip the hash."""
    from csv_cruncher_spark.operators import scd

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/"),
            d.cast("string"),
        ).alias("url"),
        d.alias("d"),
        "text",
        "lang",
    )
    t0 = F.lit(1_700_000_000).cast("long")

    def ev(df, dt, op, text_col, lang_col, idx_off):
        return df.select(
            "url",
            (t0 + F.col("d") + dt).alias("ts"),
            F.lit(op).alias("op"),
            text_col.cast("string").alias("text"),
            lang_col.cast("string").alias("lang"),
            (F.col("d") * 10 + idx_off).cast("long").alias("row_idx"),
        )

    dup_text = F.concat(F.lit("DUP:"), "text")
    log = (
        ev(base, 0, "I", F.col("text"), F.col("lang"), 0)
        .unionByName(ev(base.filter(d % 7 == 0), 0, "U", dup_text, F.col("lang"), 1))
        .unionByName(
            ev(
                base.filter(d % 4 == 1),
                500,
                "U",
                F.when(F.col("d") % 7 == 0, dup_text).otherwise(F.col("text")),
                F.col("lang"),
                2,
            )
        )
        .unionByName(
            ev(base.filter(d % 3 == 0), 1000, "U", F.concat(F.lit("EDIT:"), "text"), F.col("lang"), 3)
        )
        .unionByName(ev(base.filter(d % 5 == 0), 2000, "D", F.lit(None), F.lit(None), 4))
        .unionByName(
            ev(base.filter(d % 15 == 0), 3000, "I", F.concat(F.lit("NEW:"), "text"), F.col("lang"), 5)
        )
    )
    h = scd.scd2_history(
        log,
        "url",
        "ts",
        ["text", "lang"],
        op_col="op",
        tiebreak_col="row_idx",
        collapse_unchanged=True,
    )
    return h.select(
        "url", "valid_from", "valid_to", "is_current", "text", "lang"
    ).orderBy("url", "valid_from")


def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative row-quality expectations (cdc/expectations.py): the
    per-rule audit the CDC pipeline records per batch, run standalone
    over the documents corpus. Each rule is a JVM boolean expression; a
    NULL predicate result counts as a violation (the ternary-logic trap
    a naive NOT(cond) filter falls into); the whole rule set costs one
    scan + one partial-combined aggregation. The oracle mirrors the
    exact IS-NOT-TRUE violation semantics per rule."""
    from csv_cruncher_spark.cdc.expectations import (
        Expectation,
        expectations_report,
    )

    docs = _t(spark, sf_dir, "documents")
    rules = [
        Expectation("lang_latin", "lang IN ('en','de','es','fr')", action="drop"),
        Expectation("text_min_120", "length(text) >= 120", action="dlq"),
        Expectation("chars_consistent", "n_chars = length(text)", action="warn"),
        Expectation(
            "source_low", "CAST(substr(source, 4) AS INT) < 10", action="warn"
        ),
    ]
    return expectations_report(docs, rules)


def zorder_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve clustering vs lexicographic layout (lake/zorder.py):
    quantifies multi-dimensional file skipping for a box predicate on
    the MINOR lex dimension — the case where a key-major sort prunes
    nothing but z-order's per-bucket bounding boxes stay tight in every
    interleaved dimension. Buckets are a pure function of the row
    (code >> shift, never a sampled range split) and the interleave is
    integer shift arithmetic, so the DuckDB oracle replays both layouts
    bit-for-bit from the same formula generator (z_value_sql)."""
    from csv_cruncher_spark.lake import zorder

    docs = _t(spark, sf_dir, "documents")
    pts = docs.select(
        (F.col("doc_id") % 256).alias("x"),
        ((F.col("doc_id") * 37 + 11) % 256).alias("y"),
    )
    return zorder.pruning_report(
        pts, ["x", "y"], {"y": (0, 31)}, bits=8, bucket_bits=6
    ).orderBy("layout")


def partial_update_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse change events (cdc/patch.py): Debezium/TOAST placeholders
    resolve from the nearest earlier in-batch row (NULL-vs-unchanged
    kept distinct via the struct-wrapped carry), never across a delete
    (a D row's NULL payload IS the carried value), and fall back to the
    current-state row only when no in-batch predecessor exists. The
    oracle replays the exact carry with last_value(IGNORE NULLS) over
    struct-wrapped candidates plus the state left join — a carry that
    leaks across deletes, loses a set-to-NULL, or prefers state over
    carry all flip the hash."""
    from csv_cruncher_spark.cdc.patch import resolve_partial_updates

    PH = "__elided__"
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = docs.select(
        F.concat(F.lit("https://"), "source", F.lit(".example.com/"),
                 d.cast("string")).alias("url"),
        d.alias("d"),
        "text",
        "lang",
    )
    state = base.filter(d % 2 == 0).select(
        "url", F.concat(F.lit("STATE:"), "text").alias("text"), "lang"
    )

    def ev(df, dt, op, text_col, lang_col, idx):
        return df.select(
            "url",
            (F.lit(1000) + F.col("d") * 10 + dt).alias("ts"),
            F.lit(op).alias("op"),
            text_col.cast("string").alias("text"),
            lang_col.cast("string").alias("lang"),
            (F.col("d") * 10 + idx).cast("long").alias("row_idx"),
        )

    batch = (
        ev(
            base, 0, "U",
            F.when(F.col("d") % 3 == 0, F.lit(PH)).otherwise(
                F.concat(F.lit("NEW:"), "text")
            ),
            F.when(F.col("d") % 5 == 0, F.lit(PH)).otherwise(F.col("lang")),
            0,
        )
        .unionByName(
            ev(base.filter(d % 4 == 0), 1, "U", F.lit(PH), F.lit("xx"), 1)
        )
        .unionByName(
            ev(base.filter(d % 6 == 0), 2, "D", F.lit(None), F.lit(None), 2)
        )
        .unionByName(
            ev(base.filter(d % 12 == 0), 3, "I", F.lit(PH), F.lit("re"), 3)
        )
    )
    out = resolve_partial_updates(
        batch,
        PH,
        key_col="url",
        ts_col="ts",
        tiebreak_col="row_idx",
        payload_cols=["text", "lang"],
        fallback_state=state,
    )
    return out.select("url", "ts", "op", "text", "lang").orderBy("url", "ts")


def events_versioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal join against the SCD2 history — the query the history
    exists FOR: each event resolves to the page version whose
    ``[valid_from, valid_to)`` interval covers the event time. Composed
    from the engine's own primitives: ``scd2_history`` builds the
    intervals, ``asof_join`` (one union-and-carry shuffle, never a range
    cross join) finds the latest version at-or-before each event, and
    the half-open gap filter nulls matches whose interval closed before
    the event (a deleted page mid-gap). Oracle: DuckDB's native ASOF
    JOIN + the same gap CASE — wrong interval arithmetic on either side
    flips the hash."""
    from csv_cruncher_spark.operators.joins import asof_join
    from csv_cruncher_spark.operators.scd import scd2_history

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    log = (
        docs.select(
            F.concat(F.lit("k"), d.cast("string")).alias("key"),
            (d * 100).alias("ts"),
            F.lit("I").alias("op"),
            F.substring("text", 1, 40).alias("content"),
        )
        .unionByName(
            docs.select(
                F.concat(F.lit("k"), d.cast("string")).alias("key"),
                (d * 100 + 30).alias("ts"),
                F.lit("U").alias("op"),
                F.concat(F.lit("EDIT:"), F.substring("text", 1, 40)).alias("content"),
            )
        )
        .unionByName(
            docs.filter(d % 4 == 0).select(
                F.concat(F.lit("k"), d.cast("string")).alias("key"),
                (d * 100 + 60).alias("ts"),
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("content"),
            )
        )
    )
    hist = scd2_history(log, "key", "ts", ["content"], op_col="op")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("k"), (F.col("event_id") % 500).cast("string")).alias("key"),
        ((F.col("event_id") % 500) * 100 + F.col("event_id") % 100).alias("lookup_ts"),
    )
    joined = asof_join(
        ev,
        hist.select("key", "valid_from", "valid_to", "content"),
        on="key",
        left_time="lookup_ts",
        right_time="valid_from",
        direction="backward",
    )
    in_interval = F.col("r_valid_to").isNull() | (
        F.col("lookup_ts") < F.col("r_valid_to")
    )
    return joined.select(
        "event_id",
        "key",
        "lookup_ts",
        F.when(in_interval, F.col("r_valid_from")).alias("version_from"),
        F.when(in_interval, F.col("r_content")).alias("content"),
    ).orderBy("event_id")


def winnowing_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints (Schleimer et al. 2003 / MOSS) as a
    partial-overlap miner (operators/textstats.py
    winnowing_near_dups): char-8-gram md5 rolling hashes, min per
    4-window, distinct per doc — guaranteed to catch any shared
    normalized substring ≥ 11 chars — then the inverted-index pair join
    with a 64-doc posting cap (the stop-shingle discipline). The whole
    construction (normalization, slicing, hashing, window minima,
    posting lists, pair counts) replays in DuckDB list comprehensions,
    so a drifting normalization, hash, or window rule flips the hash."""
    from csv_cruncher_spark.operators.textstats import winnowing_near_dups

    docs = _t(spark, sf_dir, "documents")
    return winnowing_near_dups(
        docs, "doc_id", "text", k=8, window=4, min_shared=2, max_fp_docs=64
    ).orderBy("id_a", "id_b")


def winnowing_screened_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap ADMISSION screen (textstats.winnowing_screen):
    incoming batch docs (doc_id % 4 == 0) probed against the stored
    winnowing fingerprint frame of the already-ingested corpus (the
    other 3/4) — detects any shared normalized substring ≥ 11 chars at
    O(batch) probe cost, corpus text never touched. Completes the
    admission family (exact / MinHash-LSH / exact-Jaccard / Bloom) with
    the quote-and-template-reuse dimension. Oracle replays the whole
    construction (char grams → window minima → capped posting join →
    pair counts) in DuckDB list comprehensions."""
    from csv_cruncher_spark.operators.textstats import (
        winnowing_fingerprints,
        winnowing_screen,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    fps = winnowing_fingerprints(corpus, "doc_id", "text", k=8, window=4)
    return winnowing_screen(
        batch, fps, "doc_id", "text", k=8, window=4, min_shared=2,
        max_fp_docs=64,
    ).orderBy("batch_id", "corpus_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_revenue_orders": q3_top_revenue_orders,
        "q5_regional_revenue": q5_regional_revenue,
        "topk_parts": topk_parts,
        "window_top_order_per_customer": window_top_order_per_customer,
        "events_hourly_rollup": events_hourly_rollup,
        "events_sessionize": events_sessionize,
        "events_lww_state": events_lww_state,
        "ivm_event_type_stats": ivm_event_type_stats,
        "stratified_sample_docs": stratified_sample_docs,
        "dataset_split_stats": dataset_split_stats,
        "sql_function_surface": sql_function_surface,
        "corpus_vocab_topk": corpus_vocab_topk,
        "corpus_build": corpus_build,
        "pack_documents": pack_documents,
        "json_extract_props": json_extract_props,
        "set_intersect_nations": set_intersect_nations,
        "set_except_nations": set_except_nations,
        "dedup_exact_documents": dedup_exact_documents,
        "dedup_groups": dedup_groups,
        "dedup_keepers": dedup_keepers,
        "dedup_end_to_end": dedup_end_to_end,
        "doc_fingerprints": doc_fingerprints,
        "doc_quality": doc_quality,
        "doc_token_count_regex": doc_token_count_regex,
        "doc_lang_id": doc_lang_id,
        "embedding_cosine_topk": embedding_cosine_topk,
        "knn_join_exact": knn_join_exact,
        "minhash_near_dups": minhash_near_dups,
        "minhash_md5_near_dups": minhash_md5_near_dups,
        "incremental_near_dups": incremental_near_dups,
        "simhash_signatures": simhash_signatures,
        "ann_lsh_topk": ann_lsh_topk,
        "json_subtree_props": json_subtree_props,
        "salted_revenue_by_nation": salted_revenue_by_nation,
        "ngram_jaccard_near_dups": ngram_jaccard_near_dups,
        "containment_near_dups": containment_near_dups,
        "crawl_frontier_rank": crawl_frontier_rank,
        "crawl_depth_frontier": crawl_depth_frontier,
        "hub_authority_rank": hub_authority_rank,
        "doc_novelty_scores": doc_novelty_scores,
        "pmi_collocations_top": pmi_collocations_top,
        "cms_token_counts": cms_token_counts,
        "personalized_crawl_rank": personalized_crawl_rank,
        "media_decode_features": media_decode_features,
        "ann_ivf_topk": ann_ivf_topk,
        "parts_starting_with": parts_starting_with,
        "lineitem_stats": lineitem_stats,
        "lineitem_quantiles": lineitem_quantiles,
        "recursive_nation_rollup": recursive_nation_rollup,
        "json_leaves_props": json_leaves_props,
        "embedding_near_dup_pairs": embedding_near_dup_pairs,
        "simhash_near_dups": simhash_near_dups,
        "simhash_md5_near_dups": simhash_md5_near_dups,
        "hamming_near_dups": hamming_near_dups,
        "ann_lsh_full_probe": ann_lsh_full_probe,
        "dual_constant_select": dual_constant_select,
        "asof_purchase_attribution": asof_purchase_attribution,
        "asof_forward_next_view": asof_forward_next_view,
        "asof_tolerance_attribution": asof_tolerance_attribution,
        "events_type_hour_rollup": events_type_hour_rollup,
        "bloom_screened_new_docs": bloom_screened_new_docs,
        "doc_repetition_stats": doc_repetition_stats,
        "doc_pii_redact": doc_pii_redact,
        "url_host_stats": url_host_stats,
        "events_interval_join": events_interval_join,
        "incremental_jaccard_screen": incremental_jaccard_screen,
        "cdc_admission_screen": cdc_admission_screen,
        "decontamination_report": decontamination_report,
        "decontaminated_docs": decontaminated_docs,
        "temperature_mix_docs": temperature_mix_docs,
        "epoch_shuffle_docs": epoch_shuffle_docs,
        "media_features_exact": media_features_exact,
        "boilerplate_removed_docs": boilerplate_removed_docs,
        "paragraph_deduped_docs": paragraph_deduped_docs,
        "corpus_build_full": corpus_build_full,
        "quality_percentile_docs": quality_percentile_docs,
        "source_capped_docs": source_capped_docs,
        "curriculum_docs": curriculum_docs,
        "url_snapshot_lww": url_snapshot_lww,
        "crawl_snapshot_diff": crawl_snapshot_diff,
        "snapshot_cdc_batch": snapshot_cdc_batch,
        "snapshot_text_reuse": snapshot_text_reuse,
        "page_outlinks": page_outlinks,
        "host_link_graph": host_link_graph,
        "host_crawl_rank": host_crawl_rank,
        "crawl_budget_quota": crawl_budget_quota,
        "crawl_discovered_frontier": crawl_discovered_frontier,
        "url_redirect_resolution": url_redirect_resolution,
        "robots_filtered_frontier": robots_filtered_frontier,
        "anchor_text_profile": anchor_text_profile,
        "warc_roundtrip": warc_roundtrip,
        "sitemap_recrawl_plan": sitemap_recrawl_plan,
        "maintained_link_graph": maintained_link_graph,
        "doc_char_entropy": doc_char_entropy,
        "url_blocklist_docs": url_blocklist_docs,
        "token_budget_docs": token_budget_docs,
        "embedding_decontam_report": embedding_decontam_report,
        "doc_bigram_logprob": doc_bigram_logprob,
        "doc_duplicate_spans": doc_duplicate_spans,
        "duplicate_spans_removed_docs": duplicate_spans_removed_docs,
        "doc_importance_weights": doc_importance_weights,
        "doc_text_clean": doc_text_clean,
        "doc_unigram_logprob": doc_unigram_logprob,
        "doc_chunks": doc_chunks,
        "quality_bucket_docs": quality_bucket_docs,
        "gopher_quality_docs": gopher_quality_docs,
        "kmeans_centroids": kmeans_centroids,
        "bpe_merges": bpe_merges,
        "doc_bpe_tokens": doc_bpe_tokens,
        "maintained_vocab": maintained_vocab,
        "doc_tfidf_keywords": doc_tfidf_keywords,
        "corpus_zipf_slope": corpus_zipf_slope,
        "semdedup_pairs": semdedup_pairs,
        "semdedup_docs": semdedup_docs,
        "c4_cleaned_docs": c4_cleaned_docs,
        "ivf_recall_at_k": ivf_recall_at_k,
        "classifier_quality_scores": classifier_quality_scores,
        "classifier_weights": classifier_weights,
        "classifier_eval": classifier_eval,
        "classifier_calibration": classifier_calibration,
        "bm25_search": bm25_search,
        "weighted_sample_docs": weighted_sample_docs,
        "corpus_drift_report": corpus_drift_report,
        "grouped_split_stats": grouped_split_stats,
        "ivm_minmax_stats": ivm_minmax_stats,
        "source_skew_report": source_skew_report,
        "hll_distinct_tokens": hll_distinct_tokens,
        "crawl_schedule_slots": crawl_schedule_slots,
        "focused_crawl_schedule": focused_crawl_schedule,
        "host_mirror_report": host_mirror_report,
        "crawler_trap_report": crawler_trap_report_hosts,
        "recrawl_rate_estimates": recrawl_rate_estimates,
        "trap_aware_slots": trap_aware_slots,
        "canonical_url_groups": canonical_url_groups,
        "url_param_profile": url_param_profile_report,
        "mirror_host_clusters": mirror_host_clusters,
        "canonicalized_trap_urls": canonicalized_trap_urls,
        "adaptive_recrawl_slots": adaptive_recrawl_slots,
        "soft_error_hosts": soft_error_hosts,
        "fetch_retry_states": fetch_retry_states,
        "cdx_capture_index": cdx_capture_index,
        "host_url_churn": host_url_churn,
        "host_rate_violations": host_rate_violations,
        "crawl_plan_etas": crawl_plan_etas,
        "host_entropy_rollup": host_entropy_rollup,
        "scd2_url_history": scd2_url_history,
        "expectations_audit": expectations_audit,
        "zorder_pruning_report": zorder_pruning_report,
        "partial_update_resolution": partial_update_resolution,
        "events_versioned_join": events_versioned_join,
        "winnowing_dups": winnowing_dups,
        "winnowing_screened_docs": winnowing_screened_docs,
    }


def oracle_sql() -> dict[str, str]:
    from csv_cruncher_spark.lake import zorder as _zorder
    from csv_cruncher_spark.operators import sketch as _sketch

    z_expr = _zorder.z_value_sql(["x", "y"], bits=8)

    stop_list = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)
    lang_score = {
        lang: f"len(list_filter(string_split(lower(text), ' '), x -> x IN ({', '.join(repr(w) for w in markers)})))"
        for lang, markers in textstats.LANG_MARKERS.items()
    }
    langs = list(textstats.LANG_MARKERS)
    # strict argmax with first-listed-wins ties, matching textstats.lang_id
    lang_case = "CASE"
    conds = []
    for i, lang in enumerate(langs):
        gt_prev = " AND ".join(f"s_{lang} > s_{prev}" for prev in langs[:i])
        gt_zero = f"s_{lang} > 0"
        ge_later = " AND ".join(f"s_{lang} >= s_{nxt}" for nxt in langs[i + 1 :])
        cond = " AND ".join(x for x in (gt_zero, gt_prev, ge_later) if x)
        conds.append(f" WHEN {cond} THEN '{lang}'")
    lang_case += "".join(conds) + " ELSE 'und' END"
    lang_scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in lang_score.items())

    # md5-MinHash oracle (dedup.minhash_md5_pairs, n=16 bands=4 cap=500):
    # every stage is the same math in both engines — hex MIN == numeric
    # minhash, concatenated-minima band keys, matches/16 exact-binary est
    mh_n, mh_bands, mh_rows, mh_cap = 16, 4, 4, 500
    mh_mins = ",\n                     ".join(
        f"min(substr(md5(shingle || ':mh{i}'), 1, 8)) AS mh{i}"
        for i in range(mh_n)
    )
    mh_band_case = " ".join(
        "WHEN {b} THEN {key}".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * mh_rows + r}" for r in range(mh_rows)),
        )
        for b in range(mh_bands)
    )
    mh_matches = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(mh_n)
    )
    minhash_md5_sql = f"""
            WITH sh AS (
              SELECT doc_id AS id,
                     unnest(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     )) AS shingle
              FROM documents
            ),
            sig AS (
              SELECT id,
                     {mh_mins}
              FROM sh GROUP BY id
            ),
            banded AS (
              SELECT id, bb.band,
                     CASE bb.band {mh_band_case} END AS band_key
              FROM sig CROSS JOIN (SELECT unnest(range({mh_bands})) AS band) bb
            ),
            kept AS (
              SELECT band, band_key FROM banded
              GROUP BY band, band_key HAVING count(*) <= {mh_cap}
            ),
            cand AS (
              SELECT DISTINCT l.id AS id_a, r.id AS id_b
              FROM banded l
              JOIN kept USING (band, band_key)
              JOIN banded r
                ON l.band = r.band AND l.band_key = r.band_key AND l.id < r.id
            )
            SELECT c.id_a, c.id_b,
                   ({mh_matches}) / {float(mh_n)} AS est_jaccard
            FROM cand c
            JOIN sig a ON a.id = c.id_a
            JOIN sig b ON b.id = c.id_b
            WHERE ({mh_matches}) / {float(mh_n)} >= 0.5
            ORDER BY c.id_a, c.id_b
        """

    # md5-SimHash oracle (dedup.simhash_md5 + hamming_banded_pairs,
    # 60 bits, 4×15-bit bands, max_hamming=12): one md5 per token, bit j
    # of its 60-bit prefix is the vote for signature bit j — the vote
    # SUM, sign, banding, and bit_count rerank are the same math in both
    # engines.
    sh_bits, sh_band_bits, sh_maxham = 60, 15, 12
    sh_votes = ",\n                     ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(sh_bits)
    )
    sh_sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(sh_bits)
    )
    sh_mask = (1 << sh_band_bits) - 1
    sh_bands = " OR ".join(
        f"((a.sig >> {b * sh_band_bits}) & {sh_mask}) = ((b.sig >> {b * sh_band_bits}) & {sh_mask})"
        for b in range(sh_bits // sh_band_bits)
    )
    simhash_md5_sql = f"""
            WITH tok AS (
              SELECT doc_id AS id,
                     unnest(string_split(lower(text), ' ')) AS tok
              FROM documents
            ),
            hashed AS (
              SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
              FROM tok
            ),
            votes AS (
              SELECT id,
                     {sh_votes}
              FROM hashed GROUP BY id
            ),
            sig AS (
              SELECT id, {sh_sig} AS sig FROM votes
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.id < b.id
            WHERE ({sh_bands})
              AND bit_count(xor(a.sig, b.sig)) <= {sh_maxham}
            ORDER BY id_a, id_b
        """

    # decontamination oracles: same lowercase word 8-gram construction as
    # the Spark side (shingles over lower(text), short docs -> whole text)
    dc_n = 8
    dc_grams = (
        f"unnest(list_transform("
        f"range(1, greatest(len(string_split(lower(text), ' ')) - {dc_n - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice(string_split(lower(text), ' '), i, i + {dc_n - 1}), ' ')"
        f")) AS ngram"
    )
    decontam_base = f"""
            WITH bn AS (
              SELECT DISTINCT ngram FROM (
                SELECT {dc_grams} FROM documents WHERE doc_id % 40 = 0
              )
            ),
            dn AS (
              SELECT doc_id, {dc_grams} FROM documents
            ),
            hits AS (
              SELECT doc_id, count(DISTINCT dn.ngram) AS n_hit_ngrams
              FROM dn JOIN bn USING (ngram)
              GROUP BY doc_id
            )
    """
    decontam_report_sql = decontam_base + """
            SELECT doc_id, n_hit_ngrams FROM hits ORDER BY doc_id
        """
    decontam_docs_sql = decontam_base + """
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id)
            ORDER BY d.doc_id
        """

    cosine_topk_sql = f"""
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC LIMIT 20
    """

    # kmeans_centroids oracle (similarity.kmeans_fit_exact, k=8, 3
    # iterations, dim=64, micro=1e6): each unrolled round replays
    # assignment (left-fold distance — list_reduce's (t1+t2)+t3 equals
    # Spark's ((0+t1)+t2)+t3 since 0.0+t1 is exact; ties ORDER BY dist,
    # cid == the fold's strict-< first-minimum) and update
    # (order-independent BIGINT sums, one double division per cell).
    km_k, km_it, km_d = 8, 3, 64

    def _km_iter(i: int) -> str:
        return f"""
            a{i} AS (
              SELECT vec_id, vm, cid FROM (
                SELECT v.vec_id, v.vm, c.cid,
                       list_reduce(list_transform(range(1, {km_d + 1}),
                         j -> (CAST(vm[j] AS DOUBLE) - cm[j])
                              * (CAST(vm[j] AS DOUBLE) - cm[j])),
                         (a, b) -> a + b) AS dist
                FROM vm v CROSS JOIN c{i - 1} c)
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) = 1
            ),
            s{i} AS (
              SELECT cid, j AS dim, sum(vm[j]) AS s, count(*) AS n
              FROM a{i} CROSS JOIN (SELECT unnest(range(1, {km_d + 1})) AS j) u
              GROUP BY cid, j
            ),
            c{i} AS (
              SELECT p.cid, coalesce(u.cm, p.cm) AS cm
              FROM c{i - 1} p LEFT JOIN
                (SELECT cid, list(CAST(s AS DOUBLE) / n ORDER BY dim) AS cm
                 FROM s{i} GROUP BY cid) u USING (cid)
            )"""

    kmeans_sql = f"""
            WITH vm AS (
              SELECT vec_id, list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
              FROM embeddings
            ),
            c0 AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                     list_transform(vm, x -> CAST(x AS DOUBLE)) AS cm
              FROM (SELECT vec_id, vm FROM vm ORDER BY vec_id LIMIT {km_k})
            ),{','.join(_km_iter(i) for i in range(1, km_it + 1))},
            nmem AS (SELECT cid, count(*) AS n_members FROM a{km_it} GROUP BY cid)
            SELECT c.cid AS centroid_id, j.j AS dim, c.cm[j.j] AS value,
                   coalesce(nmem.n_members, 0) AS n_members
            FROM c{km_it} c CROSS JOIN (SELECT unnest(range(1, {km_d + 1})) AS j) j
            LEFT JOIN nmem USING (cid)
            ORDER BY centroid_id, dim
    """

    # bpe_merges oracle (operators/bpe.bpe_train, 10 rounds): each
    # unrolled block finds the round's argmax pair (integer-weighted
    # counts, ties (cnt DESC, l, r) on binary-collated ASCII — same in
    # both engines) and applies it with the canonical doubled-space
    # literal replace, whose left-to-right non-overlap semantics ARE the
    # classic BPE merge fold.
    bpe_n = 10

    def _bpe_round(i: int) -> str:
        return f"""
            b{i} AS (
              SELECT l, r, cnt FROM (
                SELECT toks[i] AS l, toks[i + 1] AS r, sum(freq) AS cnt FROM (
                  SELECT freq, toks, unnest(range(1, len(toks))) AS i
                  FROM (SELECT freq, string_split(trim(symstr), '  ') AS toks
                        FROM w{i - 1}))
                GROUP BY l, r)
              ORDER BY cnt DESC, l, r LIMIT 1
            ),
            w{i} AS (
              SELECT word, freq,
                     replace(symstr, ' ' || b.l || '  ' || b.r || ' ',
                             ' ' || b.l || b.r || ' ') AS symstr
              FROM w{i - 1} CROSS JOIN b{i} b
            )"""

    bpe_union = "\n              UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS lhs, r AS rhs, l || r AS merged,"
        f" cnt AS pair_count FROM b{i}"
        for i in range(1, bpe_n + 1)
    )
    bpe_with = f"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
              FROM documents
            ),
            w0 AS (
              SELECT word, count(*) AS freq,
                     '  ' || regexp_replace(word, '(.)', '\\1  ', 'g')
                          || '</w>  ' AS symstr
              FROM tok GROUP BY word
            ),{','.join(_bpe_round(i) for i in range(1, bpe_n + 1))}"""
    bpe_sql = f"""{bpe_with}
            SELECT merge_rank, lhs, rhs, merged, CAST(pair_count AS BIGINT) AS pair_count
            FROM ({bpe_union})
            ORDER BY merge_rank
    """
    # doc_bpe_tokens oracle: after round {bpe_n}, w{bpe_n}.symstr IS each
    # word's final segmentation — encoding a document is a word join +
    # order-preserving concat (the Spark side replays the replace chain
    # per word, which converges to the identical segmentation for every
    # in-vocab word, i.e. all of them).
    bpe_encode_sql = f"""{bpe_with},
            dw AS (
              SELECT doc_id, ws[i] AS word, i FROM (
                SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                      FROM documents))
            ),
            et AS (
              SELECT dw.doc_id, dw.i,
                     string_split(trim(w.symstr), '  ') AS toks
              FROM dw JOIN w{bpe_n} w ON dw.word = w.word
            ),
            agg AS (
              SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_bpe_tokens,
                     string_agg(array_to_string(toks, ' '), ' ' ORDER BY i)
                       AS bpe_text
              FROM et GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
                   coalesce(a.bpe_text, '') AS bpe_text
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id
    """

    # semdedup / ivf_recall oracles: the same micro-quantization +
    # lowest-id seed-centroid recipe as kmeans_sql (every distance/dot
    # term is an exact integer-valued double; assignment ties
    # (dist, cid) == the Spark fold's strict-< first minimum; the only
    # rounding is the cosine's IEEE sqrt/divide, identical per engine).
    sd_d = 64
    sd_assign = f"""
            vm AS (
              SELECT vec_id, list_transform(v,
                       x -> CAST(floor(x * 1000000) AS BIGINT)) AS vm
              FROM base
            ),
            c AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                     list_transform(vm, x -> CAST(x AS DOUBLE)) AS cm
              FROM (SELECT vec_id, vm FROM vm ORDER BY vec_id LIMIT 8)
            ),
            a AS (
              SELECT vec_id, vm, cid FROM (
                SELECT v.vec_id, v.vm, c.cid,
                       list_reduce(list_transform(range(1, {sd_d + 1}),
                         j -> (CAST(v.vm[j] AS DOUBLE) - c.cm[j])
                              * (CAST(v.vm[j] AS DOUBLE) - c.cm[j])),
                         (x, y) -> x + y) AS dist
                FROM vm v CROSS JOIN c)
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) = 1
            ),
            n AS (
              SELECT vec_id, cid, vm,
                     list_dot_product(CAST(vm AS DOUBLE[]),
                                      CAST(vm AS DOUBLE[])) AS nn
              FROM a
            )"""
    # planted near-copies: +0.001 on dim 1 (mirrors _semdedup_input)
    sd_base = """
            WITH base AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                     label
              FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000 AS vec_id,
                     list_prepend(CAST(embedding[1] AS DOUBLE) + 0.001,
                                  list_transform(embedding[2:],
                                                 x -> CAST(x AS DOUBLE))) AS v,
                     label
              FROM embeddings WHERE vec_id % 50 = 0
            ),"""
    sd_pairs = """,
            p AS (
              SELECT x.vec_id AS a_id, y.vec_id AS b_id, x.cid AS cid,
                     list_dot_product(CAST(x.vm AS DOUBLE[]),
                                      CAST(y.vm AS DOUBLE[]))
                       / (sqrt(x.nn) * sqrt(y.nn)) AS cosine
              FROM n x JOIN n y ON x.cid = y.cid AND x.vec_id < y.vec_id
              WHERE x.nn > 0 AND y.nn > 0
            )"""
    ir_base = """
            WITH base AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                     label
              FROM embeddings
            ),"""

    # classifier oracles (operators/classifier.py): DuckDB retrains all
    # _CLF_ITERS gradient iterations as chained CTEs generated from the
    # SAME arithmetic helpers the Spark side executes, then scores /
    # unpivots the final weight row. Integer-micro gradient sums make
    # the weights order-independent and bit-identical across engines.
    from csv_cruncher_spark.operators import classifier as _clf

    _clf_train = _clf.oracle_training_sql(
        _clf.micro_feature_sql(),
        "CAST(x_stop >= 0 AS INT)",
        iters=_CLF_ITERS,
        lr=_CLF_LR,
        keep_cols=("doc_id",),
    )
    _clf_q = _clf.cte_sigmoid_micro_sql()
    clf_scores_sql = f"""
            {_clf_train}
            SELECT doc_id, y, q AS p_micro, CAST(q >= 500000 AS INT) AS pred
            FROM (SELECT doc_id, y, {_clf_q} AS q
                  FROM feats CROSS JOIN it{_CLF_ITERS})
            ORDER BY doc_id
    """
    clf_weights_sql = f"""
            {_clf_train}
            SELECT j, feature, weight FROM (
              SELECT 0 AS j, 'bias' AS feature, w0 AS weight FROM it{_CLF_ITERS}
              UNION ALL SELECT 1, 'x_stop', w1 FROM it{_CLF_ITERS}
              UNION ALL SELECT 2, 'x_toklen', w2 FROM it{_CLF_ITERS}
              UNION ALL SELECT 3, 'x_alpha', w3 FROM it{_CLF_ITERS}
            ) ORDER BY j
    """

    # classifier evaluation oracles: retrain in DuckDB (same chained
    # CTEs), rescore, then replay the exact-integer confusion /
    # calibration arithmetic
    clf_eval_sql = f"""
            {_clf_train},
            scored AS (
              SELECT y, CAST(q >= 500000 AS INT) AS pred
              FROM (SELECT y, {_clf_q} AS q
                    FROM feats CROSS JOIN it{_CLF_ITERS})),
            c AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(y * pred) AS BIGINT) AS tp,
                     CAST(SUM((1 - y) * pred) AS BIGINT) AS fp,
                     CAST(SUM(y * (1 - pred)) AS BIGINT) AS fn,
                     CAST(SUM((1 - y) * (1 - pred)) AS BIGINT) AS tn
              FROM scored)
            SELECT n, tp, fp, fn, tn,
                   CASE WHEN n != 0 THEN
                     CAST(ROUND(1000000.0 * (tp + tn) / n) AS BIGINT) END
                     AS accuracy_micro,
                   CASE WHEN tp + fp != 0 THEN
                     CAST(ROUND(1000000.0 * tp / (tp + fp)) AS BIGINT) END
                     AS precision_micro,
                   CASE WHEN tp + fn != 0 THEN
                     CAST(ROUND(1000000.0 * tp / (tp + fn)) AS BIGINT) END
                     AS recall_micro,
                   CASE WHEN 2 * tp + fp + fn != 0 THEN
                     CAST(ROUND(1000000.0 * (2 * tp) / (2 * tp + fp + fn))
                          AS BIGINT) END AS f1_micro
            FROM c
    """
    clf_calib_sql = f"""
            {_clf_train},
            scored AS (
              SELECT y, {_clf_q} AS q FROM feats CROSS JOIN it{_CLF_ITERS}),
            b AS (
              SELECT LEAST(q * 10 // 1000000, 9) AS bin, COUNT(*) AS n,
                     CAST(SUM(q) AS BIGINT) AS sp,
                     CAST(SUM(y) AS BIGINT) AS sy
              FROM scored GROUP BY 1)
            SELECT bin, n,
                   CAST(ROUND(sp / n) AS BIGINT) AS mean_p_micro,
                   CAST(ROUND(1000000.0 * sy / n) AS BIGINT) AS pos_rate_micro,
                   CAST(ROUND(sp / n) AS BIGINT)
                     - CAST(ROUND(1000000.0 * sy / n) AS BIGINT) AS gap_micro
            FROM b ORDER BY bin
    """

    # BM25 oracle (operators/retrieval.py): the per-term expression is
    # the SAME generated SQL string Spark executes via F.expr — one
    # double divide+multiply on exact int64 operands, rounded once —
    # so scores, ranking, and tie-breaks replay bit-for-bit
    from csv_cruncher_spark.operators import retrieval as _ret

    _bm25_vals = ", ".join(f"('{qid}', '{qt}')" for qid, qt in _BM25_QUERIES)
    _bm25_term = _ret.bm25_term_sql(
        "per.tf", "dl.dl", "idf.idf", "consts.n", "consts.t"
    )
    bm25_sql = f"""
            WITH q(query_id, query_text) AS (VALUES {_bm25_vals}),
            per AS (
              SELECT doc_id, token, COUNT(*) AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM documents) t
              GROUP BY doc_id, token),
            dl AS (SELECT doc_id, SUM(tf) AS dl FROM per GROUP BY doc_id),
            consts AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                              (SELECT SUM(tf) FROM per) AS t),
            qtok AS (SELECT DISTINCT query_id, token FROM (
                       SELECT query_id,
                              unnest(regexp_extract_all(lower(query_text),
                                     '[a-z0-9]+')) AS token
                       FROM q) s),
            dfreq AS (SELECT token, COUNT(*) AS df FROM per
                      WHERE token IN (SELECT DISTINCT token FROM qtok)
                      GROUP BY token),
            idf AS (SELECT token,
                           CAST(ROUND(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                                      * 1000000) AS BIGINT) AS idf
                    FROM dfreq CROSS JOIN consts),
            terms AS (SELECT qtok.query_id, per.doc_id, {_bm25_term} AS term
                      FROM per JOIN qtok USING (token)
                               JOIN idf USING (token)
                               JOIN dl USING (doc_id)
                               CROSS JOIN consts),
            scored AS (SELECT query_id, doc_id,
                              CAST(SUM(term) AS BIGINT) AS score_micro
                       FROM terms GROUP BY query_id, doc_id),
            r AS (SELECT query_id, doc_id, score_micro,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score_micro DESC,
                                                     doc_id ASC) AS rn
                  FROM scored)
            SELECT query_id, CAST(rn AS BIGINT) AS "rank", doc_id, score_micro
            FROM r WHERE rn <= {_BM25_K} ORDER BY query_id, "rank"
    """

    # crawl-snapshot differ twins (operators/snapshot.py): the snapshot
    # construction AND the md5 fingerprint (NULL-marked, sorted compare
    # columns lang,text,warc_ts) are rebuilt independently here
    snap_old = """
              SELECT 'https://' || source || '.example.com/' || doc_id AS url,
                     CAST(1700000000 + doc_id AS BIGINT) AS warc_ts, text, lang
              FROM documents
    """
    snap_new = """
              SELECT 'https://' || source || '.example.com/' || doc_id AS url,
                     CAST(1700000000 + doc_id
                          + CASE WHEN doc_id % 7 = 1 THEN 86400 ELSE 0 END
                       AS BIGINT) AS warc_ts,
                     CASE WHEN doc_id % 7 = 1 THEN text || ' [v2]' ELSE text END
                       AS text,
                     lang
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT 'https://' || source || '.example.com/' || doc_id
                       || '?page=2' AS url,
                     CAST(1700000000 + doc_id + 172800 AS BIGINT) AS warc_ts,
                     text, lang
              FROM documents WHERE doc_id % 7 = 3
    """
    snap_fp = (
        "md5(coalesce(lang, chr(1)||chr(2)) || chr(1) || "
        "coalesce(text, chr(1)||chr(2)) || chr(1) || "
        "coalesce(CAST(warc_ts AS VARCHAR), chr(1)||chr(2)))"
    )
    snap_diff_ctes = f"""
            WITH old_snap AS ({snap_old}),
            new_snap AS ({snap_new}),
            ofp AS (SELECT url, {snap_fp} AS fp FROM old_snap),
            nfp AS (SELECT url, {snap_fp} AS fp FROM new_snap),
            diff AS (
              SELECT coalesce(o.url, n.url) AS url,
                     CASE WHEN o.fp IS NULL THEN 'added'
                          WHEN n.fp IS NULL THEN 'deleted'
                          WHEN o.fp = n.fp THEN 'unchanged'
                          ELSE 'changed' END AS status,
                     o.fp AS fp_old, n.fp AS fp_new
              FROM ofp o FULL OUTER JOIN nfp n ON o.url = n.url
            )
    """

    # HITS oracle (graph.hits_micro): unroll the half-steps as CTEs —
    # propagate over one edge side, then ceil-scaled-max normalize via
    # a scalar subquery; DuckDB // == Spark div on the non-negative ints
    def _hits_half(prev: str, out: str, to_auth: bool) -> str:
        join_on, grp = ("src", "dst") if to_auth else ("dst", "src")
        return f"""
            {out}r AS (
              SELECT nodes.node, coalesce(c.s, 0)::BIGINT AS raw
              FROM nodes LEFT JOIN (
                SELECT edges.{grp} AS t, sum(v) AS s
                FROM edges JOIN {prev} ON {prev}.node = edges.{join_on}
                GROUP BY edges.{grp}
              ) c ON c.t = nodes.node
            ),
            {out} AS (
              SELECT node,
                     (raw // greatest(1,
                        ((SELECT max(raw) FROM {out}r) + 999999) // 1000000)
                     )::BIGINT AS v
              FROM {out}r
            )"""

    hits_halves = []
    prev = "h0"
    for i in range(1, 3):
        hits_halves.append(_hits_half(prev, f"a{i}", to_auth=True))
        hits_halves.append(_hits_half(f"a{i}", f"h{i}", to_auth=False))
        prev = f"h{i}"
    hits_sql = f"""
            WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            edges AS (
              SELECT node AS src,
                     (('0x' || substr(md5(node::VARCHAR || ':lnk:' || j::VARCHAR), 1, 12))::BIGINT
                       % (SELECT n FROM nn)) AS dst
              FROM nodes, (SELECT unnest([0, 1, 2]) AS j) slots
            ),
            h0 AS (SELECT node, 1000000::BIGINT AS v FROM nodes),
            {", ".join(hits_halves)}
            SELECT h2.node AS doc_id, h2.v AS hub_micro, a2.v AS auth_micro
            FROM h2 JOIN a2 ON a2.node = h2.node
            ORDER BY auth_micro DESC, hub_micro DESC, doc_id
            LIMIT 50
    """

    # BFS-depth oracle (graph.bfs_depth): unroll the frontier rounds as
    # CTEs — candidates = edges ⋈ previous frontier, new = candidates
    # NOT EXISTS reached, reached = union — bit-exact integer depths
    bfs_rounds = []
    for k in (1, 2, 3):
        prev_f = "r0" if k == 1 else f"n{k - 1}"
        bfs_rounds.append(f"""
            c{k} AS (SELECT DISTINCT e.dst AS node
                     FROM edges e JOIN {prev_f} ON e.src = {prev_f}.node),
            n{k} AS (SELECT c{k}.node, {k} AS depth FROM c{k}
                     WHERE NOT EXISTS (SELECT 1 FROM r{k - 1}
                                       WHERE r{k - 1}.node = c{k}.node)),
            r{k} AS (SELECT * FROM r{k - 1} UNION ALL SELECT * FROM n{k})""")
    bfs_sql = f"""
            WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            edges AS (
              SELECT node AS src,
                     (('0x' || substr(md5(node::VARCHAR || ':lnk:' || j::VARCHAR), 1, 12))::BIGINT
                       % (SELECT n FROM nn)) AS dst
              FROM nodes, (SELECT unnest([0, 1, 2]) AS j) slots
            ),
            r0 AS (SELECT node, 0 AS depth FROM nodes WHERE node % 41 = 0),
            {", ".join(bfs_rounds)}
            SELECT n.node AS doc_id, r.depth
            FROM nodes n LEFT JOIN r3 r ON r.node = n.node
            ORDER BY depth ASC NULLS LAST, doc_id
    """

    # weighted host-PageRank oracle (graph.pagerank_weighted over
    # links.contract_host_graph): edges constructed from the page
    # synthesis, contracted cross-host with count weights, 3 damped
    # iterations unrolled with the (rank * w) div out_w contribution
    hpr_iters = []
    for k in (1, 2, 3):
        hpr_iters.append(f"""
            c{k} AS (SELECT e.dst_host AS d,
                            sum((r.v * e.w) // dg.out_w)::BIGINT AS s
                     FROM hedges e
                     JOIN deg dg ON dg.src_host = e.src_host
                     JOIN r{k - 1} r ON r.node = e.src_host
                     GROUP BY e.dst_host),
            r{k} AS (SELECT n.node,
                            (150000 + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS v
                     FROM hnodes n LEFT JOIN c{k} c ON c.d = n.node)""")
    host_rank_sql = f"""
            WITH pages AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents),
            links AS (
              SELECT url, 'https://hub.example.org/d' || (doc_id % 50)
                       AS outlink FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/idx/'
                       || (doc_id % 17) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/a/p'
                       || (doc_id % 5) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://cdn.example.net/lib.js' FROM pages
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT url, 'https://dup.example.com/z' FROM pages
              WHERE doc_id % 4 = 0),
            e0 AS (
              SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS src_host,
                     regexp_extract(outlink, '^https://([^/]+)/', 1) AS dst_host
              FROM links),
            hedges AS (
              SELECT src_host, dst_host, count(*)::BIGINT AS w
              FROM e0 WHERE src_host <> dst_host
              GROUP BY src_host, dst_host),
            hnodes AS (
              SELECT DISTINCT node FROM (
                SELECT src_host AS node FROM hedges
                UNION ALL SELECT dst_host FROM hedges)),
            deg AS (SELECT src_host, sum(w)::BIGINT AS out_w
                    FROM hedges GROUP BY src_host),
            r0 AS (SELECT node, 1000000::BIGINT AS v FROM hnodes),
            {", ".join(hpr_iters)}
            SELECT node AS host, v AS rank_micro FROM r3
            ORDER BY rank_micro DESC, host
    """

    return {
        "hub_authority_rank": hits_sql,
        "crawl_depth_frontier": bfs_sql,
        "host_crawl_rank": host_rank_sql,
        "doc_char_entropy": """
            WITH chars AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, length(text) + 1),
                                           i -> text[i])) AS ch
              FROM documents
              WHERE text IS NOT NULL AND length(text) >= 1),
            pc AS (
              SELECT doc_id, ch, count(*)::BIGINT AS c
              FROM chars GROUP BY doc_id, ch),
            pd AS (
              SELECT doc_id,
                     sum(c)::BIGINT AS n_chars,
                     count(*)::BIGINT AS n_distinct_chars,
                     sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000, 0)
                              AS BIGINT))::BIGINT AS s_micro
              FROM pc GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(p.n_chars, 0) AS n_chars,
                   coalesce(p.n_distinct_chars, 0) AS n_distinct_chars,
                   CAST(round(ln(CAST(p.n_chars AS DOUBLE)) * 1000000
                              - CAST(p.s_micro AS DOUBLE) / p.n_chars, 0)
                        AS BIGINT) AS entropy_micro
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN pd p USING (doc_id)
            ORDER BY doc_id
        """,
        "url_blocklist_docs": """
            WITH urls AS (
              SELECT doc_id,
                     'https://www.' || source || '.example.com/' || lang
                       || '/' || doc_id AS url,
                     'www.' || source || '.example.com' AS host
              FROM documents
              UNION ALL
              SELECT doc_id,
                     'https://cdn.static.' || source || '.example.com/' || lang
                       || '/' || doc_id AS url,
                     'cdn.static.' || source || '.example.com' AS host
              FROM documents),
            block(d) AS (
              SELECT * FROM (VALUES ('src3.example.com'),
                                    ('cdn.static.src7.example.com'),
                                    ('badhost.test')))
            SELECT doc_id, url,
                   CAST(CASE WHEN EXISTS (
                          SELECT 1 FROM block b
                          WHERE urls.host = b.d
                             OR urls.host LIKE '%.' || b.d)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_blocked
            FROM urls
            ORDER BY doc_id, url
        """,
        "crawl_snapshot_diff": f"""
            {snap_diff_ctes}
            SELECT url, status, fp_old, fp_new FROM diff ORDER BY url
        """,
        "snapshot_cdc_batch": f"""
            {snap_diff_ctes}
            SELECT CASE WHEN d.status = 'added' THEN 'I' ELSE 'U' END AS op,
                   n.url, n.warc_ts, n.text, n.lang
            FROM diff d JOIN new_snap n ON d.url = n.url
            WHERE d.status IN ('added', 'changed')
            UNION ALL
            SELECT 'D' AS op, url, CAST(1900000000 AS BIGINT) AS warc_ts,
                   CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS lang
            FROM diff WHERE status = 'deleted'
            ORDER BY url, op
        """,
        "snapshot_text_reuse": f"""
            WITH old_snap AS ({snap_old}),
            new_snap AS ({snap_new}),
            osh AS (SELECT DISTINCT sh FROM (
              SELECT unnest(list_transform(
                range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' ')
              )) AS sh
              FROM old_snap WHERE text IS NOT NULL AND len(text) > 0)),
            nsh AS (SELECT DISTINCT url, sh FROM (
              SELECT url, unnest(list_transform(
                range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' ')
              )) AS sh
              FROM new_snap WHERE text IS NOT NULL AND len(text) > 0)),
            tot AS (SELECT url, count(*) AS n FROM nsh GROUP BY url),
            hit AS (SELECT url, count(*) AS h FROM nsh
                    WHERE sh IN (SELECT sh FROM osh) GROUP BY url)
            SELECT b.url,
                   coalesce(tot.n, 0)::BIGINT AS n_shingles,
                   (CASE WHEN tot.n > 0 THEN coalesce(hit.h, 0) END)::BIGINT
                     AS n_reused,
                   round(coalesce(hit.h, 0) / tot.n, 6) AS reuse_ratio
            FROM (SELECT DISTINCT url FROM new_snap) b
            LEFT JOIN tot USING (url) LEFT JOIN hit USING (url)
            ORDER BY b.url
        """,
        "page_outlinks": """
            WITH pages AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents)
            SELECT url, outlink FROM (
              SELECT url, 'https://hub.example.org/d' || (doc_id % 50)
                       AS outlink FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/idx/'
                       || (doc_id % 17) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/a/p'
                       || (doc_id % 5) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://cdn.example.net/lib.js' FROM pages
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT url, 'https://dup.example.com/z' FROM pages
              WHERE doc_id % 4 = 0
            ) ORDER BY url, outlink
        """,
        "crawl_budget_quota": """
            WITH pages AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents),
            links AS (
              SELECT url, 'https://hub.example.org/d' || (doc_id % 50)
                       AS outlink FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/idx/'
                       || (doc_id % 17) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/a/p'
                       || (doc_id % 5) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://cdn.example.net/lib.js' FROM pages
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT url, 'https://dup.example.com/z' FROM pages
              WHERE doc_id % 4 = 0),
            wts AS (SELECT url, count(*)::BIGINT AS n_outlinks
                    FROM links GROUP BY url),
            tot AS (SELECT sum(n_outlinks)::BIGINT AS r FROM wts),
            x AS (SELECT url, n_outlinks,
                         ((n_outlinks * 100000) // r)::BIGINT AS base,
                         ((n_outlinks * 100000) % r)::BIGINT AS rem
                  FROM wts, tot),
            lf AS (SELECT (100000 - sum(base))::BIGINT AS l FROM x),
            rk AS (SELECT url, n_outlinks, base, rem,
                          ROW_NUMBER() OVER (ORDER BY rem DESC, url) AS rnk
                   FROM x)
            SELECT url, n_outlinks,
                   (base + CASE WHEN rnk <= (SELECT l FROM lf) AND rem > 0
                                THEN 1 ELSE 0 END)::BIGINT AS quota
            FROM rk ORDER BY quota DESC, url
        """,
        "host_link_graph": """
            WITH pages AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents),
            links AS (
              SELECT url, 'https://hub.example.org/d' || (doc_id % 50)
                       AS outlink FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/idx/'
                       || (doc_id % 17) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://' || source || '.example.com/a/p'
                       || (doc_id % 5) || '.html' FROM pages
              UNION ALL
              SELECT url, 'https://cdn.example.net/lib.js' FROM pages
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT url, 'https://dup.example.com/z' FROM pages
              WHERE doc_id % 4 = 0),
            e AS (
              SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS src_host,
                     regexp_extract(outlink, '^https://([^/]+)/', 1) AS dst_host,
                     url, outlink
              FROM links)
            SELECT src_host, dst_host, count(*)::BIGINT AS n_links,
                   count(DISTINCT url)::BIGINT AS n_src_pages,
                   count(DISTINCT outlink)::BIGINT AS n_dst_urls
            FROM e WHERE src_host <> dst_host
            GROUP BY src_host, dst_host
            ORDER BY src_host, dst_host
        """,
        "crawl_discovered_frontier": """
            WITH pages AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents),
            cand AS (
              SELECT url AS u FROM pages  -- self link, resolved
              UNION ALL
              SELECT 'https://frontier-' || (doc_id % 7) || '.example.net/x/'
                       || (doc_id % 23) FROM pages
              UNION ALL
              SELECT 'https://' || source || '.example.com/a/new/'
                       || (doc_id % 13) || '.html' FROM pages),
            fresh AS (
              SELECT DISTINCT u FROM cand
              WHERE u NOT IN (SELECT url FROM pages))
            SELECT regexp_extract(u, '^https://([^/]+)/', 1) AS host,
                   count(*)::BIGINT AS n_new_urls
            FROM fresh GROUP BY host ORDER BY host
        """,
        "url_redirect_resolution": """
            WITH e AS (
              SELECT 'https://r.example.com/u/' || doc_id AS src,
                     'https://r.example.com/u/' || (doc_id - 1) AS dst
              FROM documents WHERE doc_id % 5 <> 0
              UNION ALL
              SELECT 'https://r.example.com/u/' || doc_id || '?x',
                     'https://r.example.com/u/' || doc_id || '?y'
              FROM documents WHERE doc_id % 97 = 3
              UNION ALL
              SELECT 'https://r.example.com/u/' || doc_id || '?y',
                     'https://r.example.com/u/' || doc_id || '?x'
              FROM documents WHERE doc_id % 97 = 3),
            r0 AS (SELECT src, min(dst) AS dst, 1::BIGINT AS hops
                   FROM e GROUP BY src),
            r1 AS (SELECT a.src, coalesce(b.dst, a.dst) AS dst,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM r0 a LEFT JOIN r0 b ON b.src = a.dst),
            r2 AS (SELECT a.src, coalesce(b.dst, a.dst) AS dst,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM r1 a LEFT JOIN r1 b ON b.src = a.dst),
            r3 AS (SELECT a.src, coalesce(b.dst, a.dst) AS dst,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM r2 a LEFT JOIN r2 b ON b.src = a.dst)
            SELECT r3.src, r3.dst AS final_url, r3.hops AS n_hops,
                   (s.src IS NULL) AS resolved
            FROM r3 LEFT JOIN (SELECT DISTINCT src FROM e) s
              ON s.src = r3.dst
            ORDER BY r3.src
        """,
        "robots_filtered_frontier": """
            WITH f AS (
              SELECT source,
                     CASE WHEN doc_id % 4 = 0 THEN '/a/' || doc_id
                          WHEN doc_id % 4 = 1 THEN '/private/' || doc_id
                          WHEN doc_id % 4 = 2 THEN '/private/pub' || doc_id
                          ELSE '/b/' || doc_id END AS path
              FROM documents),
            fu AS (SELECT source, path,
                          'https://' || source || '.example.com' || path AS url
                   FROM f),
            hosts AS (SELECT DISTINCT source,
                             CAST(substr(source, 4) AS INT) AS num
                      FROM documents),
            rules AS (
              SELECT source || '.example.com' AS host,
                     '/private/' AS path_prefix, FALSE AS allow FROM hosts
              UNION ALL
              SELECT source || '.example.com', '/private/pub', TRUE
              FROM hosts WHERE num % 2 = 0
              UNION ALL
              SELECT source || '.example.com', '/a/', FALSE
              FROM hosts WHERE num % 3 = 0),
            cand AS (
              SELECT fu.url, r.path_prefix, r.allow,
                     row_number() OVER (PARTITION BY fu.url
                       ORDER BY len(r.path_prefix) DESC, r.allow DESC,
                                r.path_prefix DESC) AS rn
              FROM fu JOIN rules r
                ON r.host = fu.source || '.example.com'
              WHERE starts_with(fu.path, r.path_prefix))
            SELECT fu.url,
                   coalesce(c.allow, TRUE) AS is_allowed,
                   c.path_prefix AS matched_prefix
            FROM fu LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
              ON c.url = fu.url
            ORDER BY fu.url
        """,
        "anchor_text_profile": """
            WITH a AS (
              SELECT 'https://t.example.org/p' || (doc_id % 20) AS outlink,
                     'term' || (doc_id % 3) AS anchor FROM documents
              UNION ALL
              SELECT 'https://t.example.org/p' || (doc_id % 20),
                     'term' || (doc_id % 5) FROM documents
              UNION ALL
              SELECT 'https://' || source || '.example.com/shared',
                     'local' || (doc_id % 2) FROM documents),
            g AS (SELECT outlink, anchor, count(*) AS cnt
                  FROM a GROUP BY outlink, anchor),
            s AS (SELECT outlink, sum(cnt)::BIGINT AS n_refs,
                         count(*)::BIGINT AS n_anchor_texts,
                         max(cnt)::BIGINT AS top_anchor_n
                  FROM g GROUP BY outlink),
            t AS (SELECT g.outlink, min(g.anchor) AS top_anchor
                  FROM g JOIN s ON s.outlink = g.outlink
                              AND g.cnt = s.top_anchor_n
                  GROUP BY g.outlink)
            SELECT s.outlink, s.n_refs, s.n_anchor_texts,
                   t.top_anchor, s.top_anchor_n
            FROM s JOIN t ON t.outlink = s.outlink
            ORDER BY s.outlink
        """,
        "warc_roundtrip": """
            SELECT 'https://' || source || '.example.com/a/' || doc_id AS url,
                   '2026-03-01T'
                     || lpad((((doc_id * 37) % 86400) // 3600)::VARCHAR, 2, '0')
                     || ':'
                     || lpad(((((doc_id * 37) % 86400) // 60) % 60)::VARCHAR,
                             2, '0')
                     || ':'
                     || lpad((((doc_id * 37) % 86400) % 60)::VARCHAR, 2, '0')
                     || 'Z' AS warc_date,
                   'response' AS warc_type,
                   strlen('<html><body>' || text || '</body></html>')::BIGINT
                     AS content_length,
                   '<html><body>' || text || '</body></html>' AS payload
            FROM documents ORDER BY url
        """,
        "sitemap_recrawl_plan": """
            WITH d AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url,
                     (doc_id * 37) % 86400 AS lsec,
                     (doc_id * 41) % 86400 AS fsec
              FROM documents),
            claimed AS (
              SELECT url, 1772323200 + lsec AS lastmod_epoch
              FROM d WHERE doc_id % 3 <> 1
              UNION ALL
              SELECT url || '?alt', NULL FROM d WHERE doc_id % 3 <> 1),
            cm AS (SELECT url, max(lastmod_epoch) AS lastmod_epoch
                   FROM claimed GROUP BY url),
            st AS (SELECT url, 1772323200 + fsec AS fetched_epoch
                   FROM d WHERE doc_id % 3 <> 2)
            SELECT coalesce(st.url, cm.url) AS url,
                   CASE WHEN st.url IS NULL THEN 'new'
                        WHEN cm.url IS NULL THEN 'unlisted'
                        WHEN cm.lastmod_epoch IS NOT NULL
                             AND cm.lastmod_epoch > st.fetched_epoch
                          THEN 'stale'
                        ELSE 'fresh' END AS status,
                   st.fetched_epoch::BIGINT AS fetched_epoch,
                   cm.lastmod_epoch::BIGINT AS lastmod_epoch
            FROM st FULL OUTER JOIN cm ON st.url = cm.url
            ORDER BY url
        """,
        "maintained_link_graph": """
            WITH post AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/a/' || doc_id AS url
              FROM documents WHERE doc_id % 11 <> 0)
            SELECT url AS src,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'https://alt.example.org/e' || (doc_id % 13)
                        ELSE 'https://hub.example.org/d' || (doc_id % 50)
                   END AS dst
            FROM post
            UNION ALL
            SELECT url AS src,
                   'https://' || source || '.example.com/n/' || (doc_id % 9)
            FROM post
            ORDER BY src, dst
        """,
        "classifier_quality_scores": clf_scores_sql,
        "classifier_weights": clf_weights_sql,
        "classifier_eval": clf_eval_sql,
        "classifier_calibration": clf_calib_sql,
        "bm25_search": bm25_sql,
        "source_skew_report": """
            WITH c AS (SELECT source AS key, COUNT(*) AS n
                       FROM documents GROUP BY source),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c),
            top AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 20),
            r AS (SELECT key, n,
                         row_number() OVER (ORDER BY n DESC, key) AS rank,
                         CAST(SUM(n) OVER (ORDER BY n DESC, key
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS cum
                  FROM top)
            SELECT rank, key, n,
                   CAST(ROUND(1000000.0 * n / tt) AS BIGINT) AS share_micro,
                   CAST(ROUND(1000000.0 * cum / tt) AS BIGINT)
                     AS cum_share_micro
            FROM r CROSS JOIN t ORDER BY rank
        """,
        "ivm_minmax_stats": """
            SELECT event_type,
                   COUNT(*) AS n_users,
                   MIN(CAST(round(value * 100) AS BIGINT)) AS min_cents,
                   MAX(CAST(round(value * 100) AS BIGINT)) AS max_cents
            FROM (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
            WHERE rn = 1
            GROUP BY event_type ORDER BY event_type
        """,
        "corpus_drift_report": """
            WITH per AS (
              SELECT source, token, COUNT(*) AS tfg FROM (
                SELECT source,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM documents) t
              GROUP BY source, token),
            gt AS (SELECT source, CAST(SUM(tfg) AS BIGINT) AS tg
                   FROM per GROUP BY source),
            corp AS (SELECT token, CAST(SUM(tfg) AS BIGINT) AS tfc
                     FROM per GROUP BY token),
            tot AS (SELECT CAST(SUM(tfc) AS BIGINT) AS tc FROM corp),
            j AS (
              SELECT per.source, per.tfg,
                     per.tfg * (
                       CAST(ROUND(ln(CAST(per.tfg AS DOUBLE) / gt.tg)
                                  * 1000000) AS BIGINT)
                     - CAST(ROUND(ln(CAST(corp.tfc AS DOUBLE) / tot.tc)
                                  * 1000000) AS BIGINT)) AS contrib
              FROM per JOIN gt USING (source) JOIN corp USING (token)
                   CROSS JOIN tot),
            a AS (SELECT source, CAST(SUM(tfg) AS BIGINT) AS n_tokens,
                         CAST(SUM(contrib) AS BIGINT) AS s
                  FROM j GROUP BY source)
            SELECT source, n_tokens, s / n_tokens AS kl_micro
            FROM a ORDER BY source
        """,
        "grouped_split_stats": f"""
            WITH s AS (
              SELECT doc_id, source,
                     CASE WHEN substr(md5(source || ':gsplit-v1'), 1, 8)
                            < '{sampling._hex_threshold(0.8)}' THEN 'train'
                          WHEN substr(md5(source || ':gsplit-v1'), 1, 8)
                            < '{sampling._hex_threshold(0.9)}' THEN 'val'
                          ELSE 'test' END AS split
              FROM documents)
            SELECT split, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   COUNT(*) AS n_docs
            FROM s GROUP BY split ORDER BY split
        """,
        "weighted_sample_docs": """
            WITH w AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS BIGINT) AS weight
              FROM documents
            ),
            d AS (
              SELECT doc_id, lang, weight,
                     ('0x' || substr(md5(doc_id || ':wsample-v1'), 1, 8))::BIGINT
                       AS v
              FROM w WHERE weight > 0
            ),
            s AS (
              SELECT doc_id, lang, weight,
                     CAST(ROUND(ln((v + 0.5) / 4294967296.0) * 1000000)
                          AS BIGINT) AS lnu
              FROM d
            )
            SELECT doc_id, lang, weight, lnu / weight AS es_key
            FROM s ORDER BY es_key DESC, doc_id LIMIT 50
        """,
        "corpus_zipf_slope": """
            WITH v AS (
              SELECT token, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM documents) t
              GROUP BY token
            ),
            top AS (
              SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS r
              FROM v ORDER BY tf DESC, token LIMIT 100
            ),
            pts AS (
              SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
                     CAST(round(ln(CAST(tf AS DOUBLE)) * 1000000) AS BIGINT) AS y
              FROM top
            ),
            s AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM pts
            )
            SELECT n AS n_points,
                   CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                     AS zipf_slope
            FROM s
        """,
        "doc_tfidf_keywords": """
            WITH per AS (
              SELECT doc_id, token, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM documents) t
              GROUP BY doc_id, token
            ),
            v AS (SELECT token, count(*) AS df FROM per GROUP BY token),
            n AS (SELECT count(*) AS n FROM documents),
            idf AS (
              SELECT token,
                     CAST(round(ln(CAST(n.n AS DOUBLE) / v.df) * 1000000)
                          AS BIGINT) AS idf
              FROM v, n
            ),
            s AS (
              SELECT per.doc_id, per.token, per.c * idf.idf AS score_micro
              FROM per JOIN idf USING (token)
            ),
            r AS (
              SELECT doc_id, token, score_micro,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score_micro DESC, token) AS rn
              FROM s
            )
            SELECT doc_id, CAST(rn AS BIGINT) AS kw_rank, token, score_micro
            FROM r WHERE rn <= 3 ORDER BY doc_id, kw_rank
        """,
        "maintained_vocab": """
            WITH post AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' extraterm'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 11 != 0
            ),
            per_doc AS (
              SELECT doc_id, token, COUNT(*) AS c
              FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM post) t
              GROUP BY doc_id, token
            )
            SELECT token, CAST(SUM(c) AS BIGINT) AS tf,
                   CAST(COUNT(*) AS BIGINT) AS df
            FROM per_doc GROUP BY token ORDER BY token
        """,
        "bpe_merges": bpe_sql,
        "doc_bpe_tokens": bpe_encode_sql,
        "kmeans_centroids": kmeans_sql,
        "ann_ivf_topk": cosine_topk_sql,
        "parts_starting_with": """
            SELECT substring(p_name, 1, 2) AS prefix,
                   count(*) AS n,
                   round(avg(p_retailprice), 2) AS avg_price
            FROM part WHERE starts_with(p_name, 's')
            GROUP BY 1 ORDER BY prefix
        """,
        "lineitem_stats": """
            SELECT l_returnflag,
                   round(stddev_samp(l_quantity), 2) AS sd_qty,
                   round(var_samp(l_discount), 2) AS var_disc,
                   round(corr(l_quantity, l_extendedprice), 2) + 0.0 AS corr_qty_price,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "lineitem_quantiles": """
            SELECT l_returnflag,
                   quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                                 0.25) AS p25_cents,
                   quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                                 0.5) AS median_cents,
                   quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                                 0.75) AS p75_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_revenue_orders": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   max(epoch(o_orderdate))::BIGINT AS o_epoch
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1999-01-01'
              AND l_shipdate > TIMESTAMP '1999-01-01'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_regional_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "topk_parts": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "window_top_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) t
            WHERE rn = 1 ORDER BY o_custkey
        """,
        "events_hourly_rollup": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id,
                     epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                           ORDER BY ts, event_id)) AS gap_us
              FROM events)
            SELECT user_id,
                   sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "events_lww_state": """
            SELECT user_id, event_type AS last_event_type, value AS last_value FROM (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
            WHERE rn = 1 ORDER BY user_id
        """,
        "ivm_event_type_stats": """
            SELECT event_type,
                   COUNT(*) AS n_users,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
            FROM (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
            WHERE rn = 1
            GROUP BY event_type ORDER BY event_type
        """,
        "stratified_sample_docs": f"""
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix-v1'), 1, 8) <
              CASE lang
                WHEN 'en' THEN '{sampling._hex_threshold(0.5)}'
                WHEN 'de' THEN '{sampling._hex_threshold(0.25)}'
                WHEN 'zh' THEN '{sampling._hex_threshold(0.0)}'
                ELSE '{sampling._hex_threshold(0.1)}'
              END
            ORDER BY doc_id
        """,
        "dataset_split_stats": f"""
            SELECT split, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM (
              SELECT CASE
                       WHEN u < '{sampling._hex_threshold(0.8)}' THEN 'train'
                       WHEN u < '{sampling._hex_threshold(0.9)}' THEN 'val'
                       ELSE 'test'
                     END AS split,
                     n_chars
              FROM (
                SELECT substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'),
                              1, 8) AS u,
                       n_chars
                FROM documents) h) s
            GROUP BY split ORDER BY split
        """,
        "sql_function_surface": f"""
            SELECT event_id,
                   json_extract_string(props, '$.k') AS k_text,
                   substr(md5(CAST(user_id AS VARCHAR) || ':cohort-v1'),
                          1, 8) AS cohort_bucket,
                   CASE
                     WHEN substr(md5(CAST(event_id AS VARCHAR) || ':ev-split'),
                                 1, 8) < '{sampling._hex_threshold(0.8)}'
                       THEN 'train'
                     WHEN substr(md5(CAST(event_id AS VARCHAR) || ':ev-split'),
                                 1, 8) < '{sampling._hex_threshold(0.8 + 0.1)}'
                       THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM events
            WHERE event_id < 2000
              AND substr(md5(CAST(event_id AS VARCHAR) || ':keep-v1'),
                         1, 8) < '{sampling._hex_threshold(0.5)}'
            ORDER BY event_id
        """,
        "pack_documents": """
            SELECT doc_id, shard, start_offset,
                   CAST(floor(start_offset / 2048.0) AS BIGINT)
                     AS first_chunk,
                   CAST(floor((start_offset + greatest(n_tok, 1) - 1)
                              / 2048.0) AS BIGINT) AS last_chunk
            FROM (
              SELECT doc_id, doc_id % 8 AS shard, n_tok,
                     CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY doc_id % 8 ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT)
                       AS start_offset
              FROM (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(lower(text),
                                                   '[a-z0-9]+'))
                            AS BIGINT) AS n_tok
                FROM documents) t) p
            ORDER BY doc_id
        """,
        "corpus_vocab_topk": """
            SELECT token, CAST(SUM(c) AS BIGINT) AS tf,
                   CAST(COUNT(*) AS BIGINT) AS df
            FROM (
              SELECT doc_id, token, COUNT(*) AS c
              FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS token
                FROM documents) t
              GROUP BY doc_id, token) per_doc
            GROUP BY token
            HAVING CAST(SUM(c) AS BIGINT) >= 3
            ORDER BY tf DESC, token LIMIT 100
        """,
        "corpus_build": f"""
            WITH gated AS (
              SELECT doc_id, lang,
                     md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
              FROM documents
              WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10
            ),
            kept AS (
              SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       MIN(doc_id) OVER (PARTITION BY fp) AS keeper
                FROM gated) k
              WHERE doc_id = keeper
            ),
            sampled AS (
              SELECT doc_id, lang FROM kept
              WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix-v1'), 1, 8) <
                CASE lang
                  WHEN 'en' THEN '{sampling._hex_threshold(0.9)}'
                  WHEN 'de' THEN '{sampling._hex_threshold(0.5)}'
                  ELSE '{sampling._hex_threshold(0.25)}'
                END
            )
            SELECT doc_id, lang,
                   CASE
                     WHEN u < '{sampling._hex_threshold(0.8)}' THEN 'train'
                     WHEN u < '{sampling._hex_threshold(0.9)}' THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM (
              SELECT doc_id, lang,
                     substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'),
                            1, 8) AS u
              FROM sampled) s
            ORDER BY doc_id
        """,
        "json_extract_props": """
            SELECT event_id, json_extract_string(props, '$.k') AS k_text
            FROM events WHERE event_id < 500 ORDER BY event_id
        """,
        "set_intersect_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
            ORDER BY nationkey
        """,
        "set_except_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey AS nationkey FROM supplier
            ORDER BY nationkey
        """,
        "dedup_exact_documents": """
            SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text) ORDER BY fp
        """,
        "doc_fingerprints": """
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                           ' +', ' ', 'g'))) AS fp
            FROM documents ORDER BY doc_id
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   round((length(text) - (len(string_split(text, ' ')) - 1))
                         / len(string_split(text, ' ')), 6) AS mean_token_len,
                   round(len(list_filter(string_split(text, ' '), x -> x IN ({stop_list})))
                         / len(string_split(text, ' ')), 6) AS stopword_ratio,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / length(text), 6) AS alpha_ratio
            FROM documents ORDER BY doc_id
        """,
        "doc_token_count_regex": """
            SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_regex_tokens
            FROM documents ORDER BY doc_id
        """,
        "doc_lang_id": f"""
            SELECT doc_id, {lang_case} AS lang_guess FROM (
              SELECT doc_id, {lang_scores_sql} FROM documents) t
            ORDER BY doc_id
        """,
        "json_subtree_props": """
            SELECT event_id, json_extract(props, '$.k')::VARCHAR AS k_json
            FROM events WHERE event_id < 500 ORDER BY event_id
        """,
        "salted_revenue_by_nation": """
            SELECT c_nationkey,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "asof_purchase_attribution": """
            WITH v AS (
              SELECT user_id, ts, max(event_id) AS view_id
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ),
            p AS (
              SELECT user_id, ts, event_id, value
              FROM events WHERE event_type = 'purchase'
            )
            SELECT p.event_id, round(p.value, 2) AS value, v.view_id,
                   epoch_us(v.ts) AS view_epoch_us
            FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
            ORDER BY p.event_id
        """,
        "asof_forward_next_view": """
            WITH v AS (
              SELECT user_id, ts, max(event_id) AS view_id
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ),
            p AS (
              SELECT user_id, ts, event_id, value
              FROM events WHERE event_type = 'purchase'
            )
            SELECT p.event_id, round(p.value, 2) AS value, v.view_id,
                   epoch_us(v.ts) AS view_epoch_us
            FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
            ORDER BY p.event_id
        """,
        "asof_tolerance_attribution": """
            WITH v AS (
              SELECT user_id, ts, max(event_id) AS view_id
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ),
            p AS (
              SELECT user_id, ts, event_id, value
              FROM events WHERE event_type = 'purchase'
            ),
            m AS (
              SELECT p.event_id, v.view_id, v.ts AS vts, p.ts AS pts
              FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
            )
            SELECT event_id,
                   CASE WHEN pts - vts <= INTERVAL 30 MINUTE THEN view_id END AS view_id,
                   CASE WHEN pts - vts <= INTERVAL 30 MINUTE THEN epoch_us(vts) END AS view_epoch_us
            FROM m ORDER BY event_id
        """,
        "events_type_hour_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(epoch(date_trunc('hour', ts))::BIGINT, -1) AS hour_epoch,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY ROLLUP(event_type, date_trunc('hour', ts))
            ORDER BY event_type, hour_epoch
        """,
        "dual_constant_select": """
            SELECT 1::BIGINT AS one, 'x' AS s,
                   round(sqrt(2.0), 6) AS root2, NULL::VARCHAR AS nothing
        """,
        "bloom_screened_new_docs": """
            SELECT doc_id, md5(text) AS fp
            FROM documents
            WHERE doc_id % 5 = 0
              AND md5(text) NOT IN (
                SELECT md5(text) FROM documents WHERE doc_id % 5 != 0)
            ORDER BY doc_id
        """,
        "doc_repetition_stats": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            uni AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            uc AS (SELECT doc_id, tok, count(*) AS c FROM uni GROUP BY doc_id, tok),
            ud AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                          count(*) AS n_distinct, max(c) AS top_c
                   FROM uc GROUP BY doc_id),
            bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
                   FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)),
            bc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram),
            bd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                          count(*) AS n_distinct_bg, max(c) AS top_bg_c
                   FROM bc GROUP BY doc_id)
            SELECT ud.doc_id, n_tokens,
                   round(n_distinct * 1.0 / n_tokens, 6) AS distinct_token_frac,
                   round(top_c * 1.0 / n_tokens, 6) AS top_token_frac,
                   coalesce(n_bigrams, 0) AS n_bigrams,
                   round(1.0 - n_distinct_bg * 1.0 / n_bigrams, 6) AS dup_bigram_frac,
                   round(top_bg_c * 1.0 / n_bigrams, 6) AS top_bigram_frac
            FROM ud LEFT JOIN bd USING (doc_id) ORDER BY ud.doc_id
        """,
        "doc_pii_redact": """
            WITH planted AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 7 = 0
                          THEN ' contact user' || doc_id || '@mail.example.com'
                          ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                          THEN ' or call 555 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END AS text
              FROM documents)
            -- n_phones is counted on the email-redacted intermediate
            -- (mirrors redact_pii: counts == replacements performed)
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                   len(regexp_extract_all(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phones,
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g') AS redacted
            FROM planted ORDER BY doc_id
        """,
        "url_host_stats": """
            WITH urls AS (
              SELECT doc_id, n_chars,
                     'https://www.' || source || '.example.com/' || lang || '/' || doc_id AS url
              FROM documents
              UNION ALL
              SELECT doc_id, n_chars,
                     'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/' || lang
                       || '/' || doc_id || '/#frag' AS url
              FROM documents),
            parsed AS (
              SELECT n_chars,
                     lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS host,
                     CASE WHEN regexp_replace(
                              coalesce(regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), ''),
                              '/+$', '') = ''
                          THEN '/'
                          ELSE regexp_replace(
                              regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$', '')
                     END AS path
              FROM urls),
            formed AS (
              SELECT n_chars, host,
                     regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
                     'https://' || host || path AS nurl
              FROM parsed)
            SELECT host, domain,
                   count(*) AS n_urls,
                   count(DISTINCT nurl) AS n_pages,
                   round(avg(n_chars), 2) AS avg_chars
            FROM formed GROUP BY host, domain ORDER BY host
        """,
        "incremental_jaccard_screen": """
            WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
            bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
            csh AS (
              SELECT doc_id AS cid,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM corp),
            stop AS (SELECT shingle FROM csh GROUP BY shingle HAVING count(*) > 100),
            cpost AS (SELECT cid, shingle FROM csh
                      WHERE shingle NOT IN (SELECT shingle FROM stop)),
            bsh AS (
              SELECT doc_id AS bid,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM bat),
            bpost AS (SELECT bid, shingle FROM bsh
                      WHERE shingle NOT IN (SELECT shingle FROM stop)),
            bs AS (SELECT bid, count(*) AS n_b FROM bpost GROUP BY bid),
            cs AS (SELECT cid, count(*) AS n_c FROM cpost GROUP BY cid),
            common AS (SELECT bid, cid, count(*) AS n
                       FROM bpost JOIN cpost USING (shingle) GROUP BY bid, cid)
            SELECT bid AS batch_id, cid AS corpus_id,
                   round(n / (n_b + n_c - n), 6) AS jaccard
            FROM common JOIN bs USING (bid) JOIN cs USING (cid)
            WHERE n / (n_b + n_c - n) >= 0.4
            ORDER BY batch_id, corpus_id
        """,
        "cdc_admission_screen": """
            WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
            bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
            csh AS (
              SELECT doc_id AS cid,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM corp),
            stop AS (SELECT shingle FROM csh GROUP BY shingle HAVING count(*) > 100),
            cpost AS (SELECT cid, shingle FROM csh
                      WHERE shingle NOT IN (SELECT shingle FROM stop)),
            bsh AS (
              SELECT doc_id AS bid,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM bat),
            bpost AS (SELECT bid, shingle FROM bsh
                      WHERE shingle NOT IN (SELECT shingle FROM stop)),
            bs AS (SELECT bid, count(*) AS n_b FROM bpost GROUP BY bid),
            cs AS (SELECT cid, count(*) AS n_c FROM cpost GROUP BY cid),
            near AS (
              SELECT DISTINCT bid FROM (
                SELECT bid, cid, count(*) AS n
                FROM bpost JOIN cpost USING (shingle) GROUP BY bid, cid) j
              JOIN bs USING (bid) JOIN cs USING (cid)
              WHERE n / (n_b + n_c - n) >= 0.4)
            SELECT b.doc_id,
                   md5(b.text) IN (SELECT md5(text) FROM corp) AS exact_dup,
                   b.doc_id IN (SELECT bid FROM near) AS near_dup,
                   NOT (md5(b.text) IN (SELECT md5(text) FROM corp)
                        OR b.doc_id IN (SELECT bid FROM near)) AS admitted
            FROM bat b ORDER BY b.doc_id
        """,
        "events_interval_join": """
            SELECT c.event_id, e.err_id, c.user_id
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click') c
            JOIN (SELECT user_id, ts AS err_ts,
                         ts + INTERVAL 30 MINUTE AS err_end,
                         event_id AS err_id
                  FROM events WHERE event_type = 'error') e
              ON c.user_id = e.user_id AND c.ts BETWEEN e.err_ts AND e.err_end
            ORDER BY c.event_id, e.err_id
        """,
        "recursive_nation_rollup": """
            WITH RECURSIVE chain(nationkey, anc, depth) AS (
              SELECT n_nationkey::BIGINT, n_nationkey::BIGINT, 0::BIGINT FROM nation
              UNION ALL
              SELECT c.nationkey, n.n_nationkey::BIGINT, c.depth + 1
              FROM chain c JOIN nation n ON n.n_nationkey = c.anc - 5
              WHERE c.anc >= 5
            )
            SELECT nationkey, max(depth) AS depth, min(anc) AS root_key
            FROM chain GROUP BY nationkey ORDER BY nationkey
        """,
        "json_leaves_props": """
            SELECT event_id,
                   to_json([json_extract_string(j, '$.items[0].v'),
                            json_extract_string(j, '$.items[1].v')])::VARCHAR AS leaves
            FROM (SELECT event_id,
                         '{"items": [{"v": ' || json_extract_string(props, '$.k')
                         || '}, {"v": ' || event_id || '}]}' AS j
                  FROM events WHERE event_id < 500) t
            ORDER BY event_id
        """,
        "minhash_md5_near_dups": minhash_md5_sql,
        "simhash_md5_near_dups": simhash_md5_sql,
        "decontamination_report": decontam_report_sql,
        "decontaminated_docs": decontam_docs_sql,
        "epoch_shuffle_docs": """
            WITH d AS (
              SELECT doc_id,
                     substr(md5(doc_id || ':shuffle-v1:e1'), 1, 8) AS draw
              FROM documents
            ),
            s AS (
              SELECT doc_id, draw,
                     ('0x' || substr(draw, 1, 4))::BIGINT % 16 AS shard
              FROM d
            ),
            r AS (
              SELECT doc_id, shard,
                     CAST(row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id) AS BIGINT)
                       AS pos_in_shard
              FROM s
            ),
            off AS (
              SELECT shard,
                     COALESCE(SUM(n) OVER (ORDER BY shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
              FROM (SELECT shard, count(*) AS n FROM r GROUP BY shard)
            )
            SELECT r.doc_id, r.shard, r.pos_in_shard,
                   CAST(off.off + r.pos_in_shard - 1 AS BIGINT) AS global_pos
            FROM r JOIN off USING (shard)
            ORDER BY global_pos
        """,
        "doc_unigram_logprob": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM documents
            ),
            vocab AS (
              SELECT token, count(*)::BIGINT AS tf FROM tok GROUP BY token
              ORDER BY tf DESC, token LIMIT 400
            ),
            t AS (SELECT SUM(tf) AS total FROM vocab),
            lut AS (
              SELECT token,
                     CAST(round(ln(CAST(tf AS DOUBLE) / t.total) * 1000000) AS BIGINT)
                       AS micro
              FROM vocab, t
            ),
            oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT) AS m FROM t
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_tokens,
                   CAST(SUM(CASE WHEN lut.micro IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_oov,
                   CAST(SUM(COALESCE(lut.micro, oov.m)) AS DOUBLE)
                         / count(*) / 1000000 AS avg_logprob
            FROM tok LEFT JOIN lut USING (token), oov
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        "doc_chunks": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ),
            g AS (
              SELECT doc_id, toks,
                     unnest(range(1, greatest(coalesce(len(toks), 0), 1) + 1, 48))
                       AS start_token
              FROM t
            )
            SELECT doc_id,
                   CAST((start_token - 1) // 48 AS BIGINT) AS chunk_no,
                   CAST(start_token AS BIGINT) AS start_token,
                   CAST(coalesce(len(toks[start_token : start_token + 63]), 0)
                        AS BIGINT) AS n_chunk_tokens,
                   coalesce(array_to_string(toks[start_token : start_token + 63], ' '),
                            '') AS chunk_text
            FROM g ORDER BY doc_id, chunk_no
        """,
        "quality_bucket_docs": """
            WITH s AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                       AS score
              FROM documents
            ),
            t AS (
              SELECT lang, quantile_cont(score, 0.25) AS t1,
                     quantile_cont(score, 0.75) AS t2
              FROM s GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.score,
                   CASE WHEN s.score >= t.t2 THEN 'head'
                        WHEN s.score >= t.t1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            -- null-safe join: the Spark side keeps a NULL stratum with
            -- its own thresholds (eqNullSafe), so the oracle must too
            FROM s JOIN t ON s.lang IS NOT DISTINCT FROM t.lang
            ORDER BY s.doc_id
        """,
        "gopher_quality_docs": f"""
            WITH d AS (SELECT doc_id, nullif(text, '') AS text FROM documents),
            q AS (
              SELECT doc_id,
                     len(string_split(text, ' ')) AS n_tokens,
                     (length(text) - (len(string_split(text, ' ')) - 1))
                       / len(string_split(text, ' ')) AS mean_token_len,
                     len(list_filter(string_split(text, ' '), x -> x IN ({stop_list})))
                       / len(string_split(text, ' ')) AS stopword_ratio,
                     length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       / length(text) AS alpha_ratio
              FROM d
            ),
            t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
            uni AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            uc AS (SELECT doc_id, tok, count(*) AS c FROM uni GROUP BY doc_id, tok),
            ud AS (SELECT doc_id, sum(c) AS n_tok_r, max(c) AS top_c
                   FROM uc GROUP BY doc_id),
            bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
                   FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)),
            bc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram),
            bd AS (SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct_bg
                   FROM bc GROUP BY doc_id),
            j AS (
              SELECT q.doc_id, coalesce(q.n_tokens, 0) AS n_tok,
                     q.mean_token_len, q.stopword_ratio, q.alpha_ratio,
                     ud.top_c * 1.0 / ud.n_tok_r AS top_token_frac,
                     1.0 - bd.n_distinct_bg * 1.0 / bd.n_bigrams AS dup_bigram_frac
              FROM q LEFT JOIN ud USING (doc_id) LEFT JOIN bd USING (doc_id)
            ),
            r AS (
              SELECT doc_id, n_tok, concat_ws(',',
                       CASE WHEN n_tok < 40 THEN 'too_few_tokens' END,
                       CASE WHEN n_tok > 100000 THEN 'too_many_tokens' END,
                       CASE WHEN mean_token_len < 3.0 OR mean_token_len > 10.0
                            THEN 'bad_mean_token_len' END,
                       CASE WHEN alpha_ratio < 0.6 THEN 'low_alpha_ratio' END,
                       CASE WHEN stopword_ratio < 0.05 THEN 'low_stopword_ratio' END,
                       CASE WHEN top_token_frac > 0.1 THEN 'repetitive_top_token' END,
                       CASE WHEN dup_bigram_frac > 0.4 THEN 'dup_bigrams' END)
                     AS reasons
              FROM j
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                   reasons = '' AS keep, reasons
            FROM r ORDER BY doc_id
        """,
        "doc_importance_weights": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM documents
            ),
            ttok AS (
              SELECT t.token FROM tok t JOIN documents d USING (doc_id)
              WHERE d.lang = 'en'
            ),
            tvocab AS (
              SELECT token, count(*)::BIGINT AS tf FROM ttok GROUP BY token
              ORDER BY tf DESC, token LIMIT 250
            ),
            rvocab AS (
              SELECT token, count(*)::BIGINT AS tf FROM tok GROUP BY token
              ORDER BY tf DESC, token LIMIT 250
            ),
            tt AS (SELECT SUM(tf) AS total FROM tvocab),
            rt AS (SELECT SUM(tf) AS total FROM rvocab),
            tlut AS (
              SELECT token,
                     CAST(round(ln(CAST(tf AS DOUBLE) / tt.total) * 1000000)
                          AS BIGINT) AS mt
              FROM tvocab, tt
            ),
            rlut AS (
              SELECT token,
                     CAST(round(ln(CAST(tf AS DOUBLE) / rt.total) * 1000000)
                          AS BIGINT) AS mr
              FROM rvocab, rt
            ),
            oov AS (
              SELECT CAST(round(ln(0.5 / tt.total) * 1000000) AS BIGINT) AS ot,
                     CAST(round(ln(0.5 / rt.total) * 1000000) AS BIGINT) AS orr
              FROM tt, rt
            ),
            agg AS (
              SELECT tok.doc_id,
                     count(*)::BIGINT AS n_tokens,
                     CAST(SUM(COALESCE(tlut.mt, oov.ot)
                              - COALESCE(rlut.mr, oov.orr)) AS DOUBLE)
                       / 1000000 AS logweight
              FROM tok LEFT JOIN tlut USING (token)
                       LEFT JOIN rlut USING (token), oov
              GROUP BY tok.doc_id
            )
            -- join-back keeps token-free documents (n_tokens=0, NULL
            -- logweight), matching the operator's explode_outer contract
            SELECT d.doc_id,
                   COALESCE(agg.n_tokens, 0) AS n_tokens,
                   agg.logweight
            FROM documents d LEFT JOIN agg USING (doc_id)
            ORDER BY d.doc_id
        """,
        "doc_duplicate_spans": f"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 5 = 0
                                  THEN '{DISCLAIMER}' ELSE '' END AS text
              FROM documents),
            tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM planted),
            -- parallel unnest zips positions with their window hashes
            spans AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(toks) - 7)) AS pos,
                     unnest(list_transform(generate_series(1, len(toks) - 7),
                            i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
              FROM tok WHERE len(toks) >= 8),
            per_doc AS (SELECT DISTINCT h, doc_id FROM spans),
            dup AS (
              SELECT h, count(*)::BIGINT AS span_docs
              FROM per_doc GROUP BY h HAVING count(*) >= 2)
            SELECT s.doc_id, CAST(s.pos AS BIGINT) AS pos, dup.span_docs
            FROM spans s JOIN dup USING (h)
            ORDER BY s.doc_id, s.pos
        """,
        "duplicate_spans_removed_docs": f"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 5 = 0
                                  THEN '{DISCLAIMER}' ELSE '' END AS text
              FROM documents),
            tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM planted),
            spans AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(toks) - 7)) AS pos,
                     unnest(list_transform(generate_series(1, len(toks) - 7),
                            i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
              FROM tok WHERE len(toks) >= 8),
            per_doc AS (SELECT DISTINCT h, doc_id FROM spans),
            dup AS (
              SELECT h FROM per_doc GROUP BY h HAVING count(*) >= 2),
            -- keep-first: rn 1 in (doc_id, pos) order is the survivor;
            -- every later occurrence cuts its 8-token coverage
            flagged AS (
              SELECT s.doc_id, s.pos,
                     row_number() OVER (
                       PARTITION BY s.h ORDER BY s.doc_id, s.pos) AS rn
              FROM spans s JOIN dup USING (h)),
            covered AS (
              SELECT DISTINCT doc_id, tpos FROM (
                SELECT doc_id,
                       unnest(generate_series(pos, pos + 7)) AS tpos
                FROM flagged WHERE rn > 1)),
            tokens AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(toks))) AS tpos,
                     unnest(toks) AS tk
              FROM tok),
            agg AS (
              SELECT t.doc_id,
                     COALESCE(string_agg(
                       CASE WHEN c.tpos IS NULL THEN t.tk END,
                       ' ' ORDER BY t.tpos), '') AS text,
                     CAST(SUM(CASE WHEN c.tpos IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_kept_tokens,
                     CAST(SUM(CASE WHEN c.tpos IS NULL THEN 0 ELSE 1 END)
                          AS BIGINT) AS n_removed_tokens
              FROM tokens t LEFT JOIN covered c USING (doc_id, tpos)
              GROUP BY t.doc_id)
            -- join-back keeps token-free documents (empty text, 0/0)
            SELECT p.doc_id,
                   COALESCE(agg.text, '') AS text,
                   COALESCE(agg.n_kept_tokens, 0) AS n_kept_tokens,
                   COALESCE(agg.n_removed_tokens, 0) AS n_removed_tokens
            FROM planted p LEFT JOIN agg USING (doc_id)
            ORDER BY p.doc_id
        """,
        "doc_bigram_logprob": """
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents
            ),
            -- parallel unnest of two aligned list slices zips them:
            -- (toks[i], toks[i+1]) = the bigram stream
            big AS (
              SELECT doc_id,
                     unnest(toks[1:len(toks)-1]) AS w1,
                     unnest(toks[2:len(toks)]) AS w2
              FROM tok WHERE len(toks) >= 2
            ),
            bic AS (
              SELECT w1, w2, count(*)::BIGINT AS c_bi FROM big GROUP BY w1, w2
            ),
            ctx AS (
              SELECT w1, CAST(SUM(c_bi) AS BIGINT) AS c_ctx FROM bic GROUP BY w1
            ),
            bilut AS (
              SELECT w1, w2,
                     CAST(round(ln(CAST(c_bi AS DOUBLE) / c_ctx) * 1000000)
                          AS BIGINT) AS mbi
              FROM bic JOIN ctx USING (w1)
              ORDER BY c_bi DESC, w1, w2 LIMIT 300
            ),
            alltok AS (
              SELECT doc_id, unnest(toks) AS token FROM tok
            ),
            uni AS (
              SELECT token, count(*)::BIGINT AS tf FROM alltok GROUP BY token
              ORDER BY tf DESC, token LIMIT 200
            ),
            t AS (SELECT SUM(tf) AS total FROM uni),
            unilut AS (
              SELECT token AS w2,
                     CAST(round(ln(0.4 * CAST(tf AS DOUBLE) / t.total) * 1000000)
                          AS BIGINT) AS muni
              FROM uni, t
            ),
            oov AS (
              SELECT CAST(round(ln(0.4 * 0.5 / total) * 1000000) AS BIGINT) AS m
              FROM t
            ),
            sc AS (
              SELECT b.doc_id,
                     COALESCE(bilut.mbi, unilut.muni, oov.m) AS m,
                     CASE WHEN bilut.mbi IS NULL AND unilut.muni IS NOT NULL
                          THEN 1 ELSE 0 END AS is_backoff,
                     CASE WHEN bilut.mbi IS NULL AND unilut.muni IS NULL
                          THEN 1 ELSE 0 END AS is_oov
              FROM big b
              LEFT JOIN bilut ON b.w1 = bilut.w1 AND b.w2 = bilut.w2
              LEFT JOIN unilut ON b.w2 = unilut.w2, oov
            ),
            agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                     CAST(SUM(is_backoff) AS BIGINT) AS n_backoff,
                     CAST(SUM(is_oov) AS BIGINT) AS n_oov,
                     CAST(SUM(m) AS DOUBLE) / count(*) / 1000000
                       AS avg_logscore
              FROM sc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(agg.n_bigrams, 0) AS n_bigrams,
                   COALESCE(agg.n_backoff, 0) AS n_backoff,
                   COALESCE(agg.n_oov, 0) AS n_oov,
                   agg.avg_logscore
            FROM documents d LEFT JOIN agg USING (doc_id)
            ORDER BY d.doc_id
        """,
        "doc_text_clean": """
            SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars_clean
            FROM (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(
                       nfc_normalize(text || ' caf' || 'e' || chr(769)
                                     || ' ' || chr(7) || 'x  y'),
                       '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                       '[ \\t\\n\\r]+', ' ', 'g')) AS text
              FROM documents
            )
            ORDER BY doc_id
        """,
        "source_capped_docs": """
            SELECT doc_id, source, lang FROM (
              SELECT doc_id, source, lang,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':cap-v1'), 1, 8),
                                doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 15
            ORDER BY doc_id
        """,
        "curriculum_docs": """
            WITH s AS (
              SELECT doc_id, lang, source,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                       AS score
              FROM documents
            ),
            t AS (
              SELECT lang, quantile_cont(score, 0.5) AS thr FROM s GROUP BY lang
            ),
            kept AS (
              SELECT s.doc_id, s.lang, s.source, s.score
              FROM s JOIN t USING (lang) WHERE s.score >= t.thr
            ),
            capped AS (
              SELECT doc_id, lang, score FROM (
                SELECT doc_id, lang, score,
                       row_number() OVER (
                         PARTITION BY source
                         ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':cap-v1'), 1, 8),
                                  doc_id
                       ) AS rn
                FROM kept) WHERE rn <= 20
            ),
            pack AS (
              SELECT doc_id,
                     CAST(doc_id % 8 AS BIGINT) AS pack_shard,
                     CAST(COALESCE(SUM(score) OVER (
                       PARTITION BY doc_id % 8 ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset,
                     score AS n_tok
              FROM capped
            ),
            sh AS (
              SELECT doc_id,
                     substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle-v1:e1'), 1, 8)
                       AS draw
              FROM capped
            ),
            s2 AS (
              SELECT doc_id, draw,
                     ('0x' || substr(draw, 1, 4))::BIGINT % 16 AS shuffle_shard
              FROM sh
            ),
            r AS (
              SELECT doc_id, shuffle_shard,
                     CAST(row_number() OVER (
                       PARTITION BY shuffle_shard ORDER BY draw, doc_id) AS BIGINT)
                       AS pos_in_shard
              FROM s2
            ),
            off AS (
              SELECT shuffle_shard,
                     COALESCE(SUM(n) OVER (ORDER BY shuffle_shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
              FROM (SELECT shuffle_shard, count(*) AS n FROM r GROUP BY shuffle_shard)
            )
            SELECT capped.doc_id, capped.lang, capped.score,
                   pack.pack_shard, pack.start_offset,
                   CAST(floor(pack.start_offset / 1024.0) AS BIGINT) AS first_chunk,
                   CAST(floor((pack.start_offset + greatest(pack.n_tok, 1) - 1)
                              / 1024.0) AS BIGINT) AS last_chunk,
                   r.shuffle_shard, r.pos_in_shard,
                   CAST(off.off + r.pos_in_shard - 1 AS BIGINT) AS global_pos
            FROM capped JOIN pack USING (doc_id) JOIN r USING (doc_id)
                 JOIN off USING (shuffle_shard)
            ORDER BY capped.doc_id
        """,
        "url_snapshot_lww": """
            -- nurl below is the canonical spelling constructed
            -- INDEPENDENTLY of the engine (lowercase scheme+host, default
            -- port and fragment stripped, trailing slash folded): the
            -- Spark side derives it by normalize_url over BOTH raw
            -- spellings, so a normalization drift desyncs the key column
            -- and flips the hash, and arg_max replays the LWW winner
            WITH snaps AS (
              SELECT 'https://www.' || source || '.example.com/' || lang
                       || '/' || doc_id AS nurl,
                     1700000000 + doc_id AS warc_ts, 'old' AS crawl, doc_id
              FROM documents
              UNION ALL
              SELECT 'https://www.' || source || '.example.com/' || lang
                       || '/' || doc_id AS nurl,
                     1700000000 + doc_id + 86400 AS warc_ts, 'new' AS crawl,
                     doc_id
              FROM documents)
            SELECT nurl,
                   arg_max(doc_id, warc_ts) AS doc_id,
                   arg_max(crawl, warc_ts) AS crawl,
                   CAST(max(warc_ts) AS BIGINT) AS warc_ts
            FROM snaps GROUP BY nurl ORDER BY nurl
        """,
        "quality_percentile_docs": """
            WITH s AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                       AS score
              FROM documents
            ),
            t AS (
              SELECT lang, quantile_cont(score, 0.5) AS thr FROM s GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.score, round(t.thr, 6) AS thr
            FROM s JOIN t USING (lang)
            WHERE s.score >= t.thr
            ORDER BY s.doc_id
        """,
        "corpus_build_full": f"""
            WITH bn AS (
              SELECT DISTINCT ngram FROM (
                SELECT {dc_grams} FROM documents WHERE doc_id % 40 = 0
              )
            ),
            hit AS (
              SELECT DISTINCT doc_id FROM (
                SELECT doc_id, {dc_grams} FROM documents
              ) dn JOIN bn USING (ngram)
            ),
            gated AS (
              SELECT doc_id, lang,
                     md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
              FROM documents
              WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10
                AND doc_id NOT IN (SELECT doc_id FROM hit)
            ),
            kept AS (
              SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       MIN(doc_id) OVER (PARTITION BY fp) AS keeper
                FROM gated) k
              WHERE doc_id = keeper
            ),
            c AS (SELECT lang, count(*)::BIGINT AS n FROM kept GROUP BY lang),
            t AS (SELECT sum(n) AS total, sum(sqrt(n)) AS denom FROM c),
            thr AS (
              SELECT lang,
                     CASE WHEN frac >= 1.0 THEN 'g'
                          ELSE printf('%08x', CAST(floor(frac * 4294967296) AS BIGINT))
                     END AS thr
              FROM (
                SELECT c.lang,
                       round(least(1.0,
                         ((t.total * 0.5) * (sqrt(c.n) / t.denom)) / c.n), 6) AS frac
                FROM c, t)
            ),
            sampled AS (
              SELECT k.doc_id, k.lang FROM kept k JOIN thr USING (lang)
              WHERE substr(md5(CAST(k.doc_id AS VARCHAR) || ':mix-v1'), 1, 8)
                    < thr.thr
            )
            SELECT doc_id, lang,
                   CASE
                     WHEN u < '{sampling._hex_threshold(0.8)}' THEN 'train'
                     WHEN u < '{sampling._hex_threshold(0.9)}' THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM (
              SELECT doc_id, lang,
                     substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'),
                            1, 8) AS u
              FROM sampled) s
            ORDER BY doc_id
        """,
        "boilerplate_removed_docs": """
            WITH lined AS (
              SELECT doc_id,
                     list_transform(
                       range(1, CAST(ceil(len(string_split(text, ' ')) / 12.0) AS BIGINT) + 1),
                       i -> array_to_string(
                         list_slice(string_split(text, ' '), (i-1)*12 + 1, (i-1)*12 + 12), ' ')
                     ) AS ls
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     unnest(range(1, len(ls) + 1)) AS line_no,
                     unnest(ls) AS line
              FROM lined
            ),
            freq AS (
              SELECT line FROM (SELECT DISTINCT line, doc_id FROM l)
              GROUP BY line HAVING count(*) >= 3
            )
            SELECT l.doc_id,
                   COALESCE(string_agg(
                     CASE WHEN f.line IS NULL THEN l.line END,
                     chr(10) ORDER BY l.line_no), '') AS text,
                   CAST(SUM(CASE WHEN f.line IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept_lines,
                   CAST(SUM(CASE WHEN f.line IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_removed_lines
            FROM l LEFT JOIN freq f USING (line)
            GROUP BY l.doc_id
            ORDER BY l.doc_id
        """,
        "paragraph_deduped_docs": """
            WITH lined AS (
              SELECT doc_id,
                     list_transform(
                       range(1, CAST(ceil(len(string_split(text, ' ')) / 12.0) AS BIGINT) + 1),
                       i -> array_to_string(
                         list_slice(string_split(text, ' '), (i-1)*12 + 1, (i-1)*12 + 12), ' ')
                     ) AS ls
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     unnest(range(1, len(ls) + 1)) AS para_no,
                     unnest(ls) AS para
              FROM lined
            ),
            ranked AS (
              SELECT doc_id, para_no, para,
                     row_number() OVER (
                       PARTITION BY para ORDER BY doc_id, para_no) AS rn
              FROM l
            )
            -- keep = first occurrence OR exempt-short (min_chars=1:
            -- only the empty paragraph, which the chunking never emits)
            SELECT doc_id,
                   COALESCE(string_agg(
                     CASE WHEN rn = 1 OR length(para) < 1 THEN para END,
                     chr(10) ORDER BY para_no), '') AS text,
                   CAST(SUM(CASE WHEN rn = 1 OR length(para) < 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_paras,
                   CAST(SUM(CASE WHEN rn = 1 OR length(para) < 1
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_removed_paras
            FROM ranked
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        "media_features_exact": """
            WITH m AS (
              SELECT doc_id, sha256(text) AS h,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
              FROM documents WHERE doc_id < 200
            )
            SELECT doc_id,
                   'unknown' AS format,
                   n_bytes,
                   round(CAST(CAST(
                     ('0x' || substr(h, 7, 2) || substr(h, 5, 2)
                            || substr(h, 3, 2) || substr(h, 1, 2))::BIGINT
                     AS DOUBLE) / 4294967296 AS FLOAT)::DOUBLE, 6) AS f0,
                   round(CAST(CAST(
                     ('0x' || substr(h, 15, 2) || substr(h, 13, 2)
                            || substr(h, 11, 2) || substr(h, 9, 2))::BIGINT
                     AS DOUBLE) / 4294967296 AS FLOAT)::DOUBLE, 6) AS f1
            FROM m ORDER BY doc_id
        """,
        "temperature_mix_docs": """
            WITH c AS (
              SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
            ),
            t AS (SELECT sum(n) AS total, sum(sqrt(n)) AS denom FROM c),
            f AS (
              SELECT c.lang,
                     round(least(1.0,
                       ((t.total * 0.6) * (sqrt(c.n) / t.denom)) / c.n), 6) AS frac
              FROM c, t
            ),
            thr AS (
              SELECT lang,
                     CASE WHEN frac >= 1.0 THEN 'g'
                          ELSE printf('%08x', CAST(floor(frac * 4294967296) AS BIGINT))
                     END AS thr
              FROM f
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr USING (lang)
            WHERE substr(md5(d.doc_id || ':temp-v1'), 1, 8) < thr.thr
            ORDER BY d.doc_id
        """,
        "ngram_jaccard_near_dups": """
            WITH sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
            f AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            -- sizes over the FILTERED vocabulary, matching the engine:
            -- Jaccard numerator and denominator use the same shingle space
            sizes AS (SELECT id, count(*) AS n FROM f GROUP BY id),
            common AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM common JOIN sizes sa ON sa.id = common.id_a
                        JOIN sizes sb ON sb.id = common.id_b
            WHERE n_common / (sa.n + sb.n - n_common) >= 0.4
            ORDER BY id_a, id_b
        """,
        "containment_near_dups": """
            WITH sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
            f AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, count(*) AS n FROM f GROUP BY id),
            common AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(n_common / least(sa.n, sb.n), 6) AS containment,
                   sa.n AS n_a, sb.n AS n_b
            FROM common JOIN sizes sa ON sa.id = common.id_a
                        JOIN sizes sb ON sb.id = common.id_b
            WHERE n_common / least(sa.n, sb.n) >= 0.5
            ORDER BY id_a, id_b
        """,
        "crawl_frontier_rank": """
            WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            edges AS (
              SELECT node AS src,
                     (('0x' || substr(md5(node::VARCHAR || ':lnk:' || j::VARCHAR), 1, 12))::BIGINT
                       % (SELECT n FROM nn)) AS dst
              FROM nodes, (SELECT unnest([0, 1, 2]) AS j) slots
            ),
            r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
            r1 AS (
              SELECT nodes.node,
                     (150000 + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r0 ON r0.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r2 AS (
              SELECT nodes.node,
                     (150000 + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r1 ON r1.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r3 AS (
              SELECT nodes.node,
                     (150000 + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r2 ON r2.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            )
            SELECT node AS doc_id, r AS rank_micro
            FROM r3
            ORDER BY rank_micro DESC, doc_id ASC
            LIMIT 50
        """,
        "personalized_crawl_rank": """
            WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            edges AS (
              SELECT node AS src,
                     (('0x' || substr(md5(node::VARCHAR || ':lnk:' || j::VARCHAR), 1, 12))::BIGINT
                       % (SELECT n FROM nn)) AS dst
              FROM nodes, (SELECT unnest([0, 1, 2]) AS j) slots
            ),
            r0 AS (
              SELECT node,
                     (CASE WHEN node % 50 = 0 THEN 1000000 ELSE 0 END)::BIGINT AS r
              FROM nodes
            ),
            r1 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r0 ON r0.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r2 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r1 ON r1.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r3 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r2 ON r2.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            )
            SELECT node AS doc_id, r AS rank_micro
            FROM r3
            ORDER BY rank_micro DESC, doc_id ASC
            LIMIT 50
        """,
        "doc_novelty_scores": """
            WITH sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            first AS (SELECT shingle, min(id) AS first_id FROM sh GROUP BY shingle),
            per AS (
              SELECT id, count(*) AS n_shingles,
                     sum(CASE WHEN id = first_id THEN 1 ELSE 0 END) AS n_novel
              FROM sh JOIN first USING (shingle)
              GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(per.n_shingles, 0)::BIGINT AS n_shingles,
                   coalesce(per.n_novel, 0)::BIGINT AS n_novel,
                   round(per.n_novel / per.n_shingles, 6) AS novelty
            FROM documents d LEFT JOIN per ON per.id = d.doc_id
            ORDER BY d.doc_id
        """,
        "pmi_collocations_top": """
            WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
            uni AS (SELECT unnest(w) AS word FROM t),
            uc AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
            tu AS (SELECT sum(c)::BIGINT AS v FROM uc),
            bp AS (
              SELECT p['w1'] AS w1, p['w2'] AS w2 FROM (
                SELECT unnest(list_transform(
                  range(1, len(w)),
                  i -> {'w1': w[i], 'w2': w[i + 1]}
                )) AS p FROM t
              )
            ),
            tb AS (SELECT count(*)::BIGINT AS v FROM bp),
            bc AS (
              SELECT w1, w2, count(*) AS n_pair FROM bp
              GROUP BY w1, w2 HAVING count(*) >= 5
            )
            SELECT bc.w1, bc.w2, bc.n_pair,
                   CAST(ROUND(LN((CAST(bc.n_pair AS DOUBLE) * (SELECT v FROM tu) * (SELECT v FROM tu)) /
                     (CAST((SELECT v FROM tb) AS DOUBLE) * ca.c * cb.c)) * 1000000, 0) AS BIGINT) AS pmi_micro
            FROM bc JOIN uc ca ON ca.word = bc.w1
                    JOIN uc cb ON cb.word = bc.w2
            ORDER BY pmi_micro DESC, bc.w1, bc.w2
            LIMIT 100
        """,
        "cms_token_counts": """
            WITH toks AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents
            ),
            exact AS (SELECT tok, count(*) AS exact_count FROM toks GROUP BY tok),
            top AS (
              SELECT tok, exact_count FROM exact
              ORDER BY exact_count DESC, tok ASC LIMIT 20
            ),
            rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
            cells AS (
              SELECT rr.r AS r,
                     (('0x' || substr(md5(tok || ':cms:' || rr.r::VARCHAR), 1, 12))::BIGINT
                       % 1024) AS bucket,
                     count(*) AS c
              FROM toks, rr
              GROUP BY 1, 2
            ),
            probe AS (
              SELECT t.tok, t.exact_count, rr.r AS r,
                     (('0x' || substr(md5(t.tok || ':cms:' || rr.r::VARCHAR), 1, 12))::BIGINT
                       % 1024) AS bucket
              FROM top t, rr
            )
            SELECT p.tok, p.exact_count,
                   min(coalesce(cells.c, 0))::BIGINT AS est_count
            FROM probe p LEFT JOIN cells
              ON cells.r = p.r AND cells.bucket = p.bucket
            GROUP BY 1, 2
            ORDER BY exact_count DESC, tok ASC
        """,
        "hll_distinct_tokens": f"""
            WITH toks AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
            ),
            exact AS (
              SELECT source, count(DISTINCT tok)::BIGINT AS exact_distinct
              FROM toks GROUP BY source
            ),
            hll AS (
              {_sketch.hll_oracle_sql("toks", "tok", m=1024, group_cols=("source",))}
            )
            SELECT e.source, e.exact_distinct, h.present, h.zeros, h.z_scaled,
                   h.est_distinct
            FROM exact e JOIN hll h ON h.source = e.source
            ORDER BY e.source
        """,
        "crawl_schedule_slots": """
            WITH f AS (
              SELECT doc_id, source AS host, CAST(n_chars AS DOUBLE) AS prio
              FROM documents
            ),
            r AS (
              SELECT doc_id, host,
                     row_number() OVER (
                       PARTITION BY host ORDER BY prio DESC, doc_id
                     )::BIGINT AS rank_in_host
              FROM f
            )
            SELECT doc_id, host, rank_in_host,
                   CAST(FLOOR((rank_in_host - 1) / 25.0) AS BIGINT) AS slot
            FROM r ORDER BY host, rank_in_host
        """,
        "focused_crawl_schedule": """
            WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            edges AS (
              SELECT node AS src,
                     (('0x' || substr(md5(node::VARCHAR || ':lnk:' || j::VARCHAR), 1, 12))::BIGINT
                       % (SELECT n FROM nn)) AS dst
              FROM nodes, (SELECT unnest([0, 1, 2]) AS j) slots
            ),
            r0 AS (
              SELECT node,
                     (CASE WHEN node % 50 = 0 THEN 1000000 ELSE 0 END)::BIGINT AS r
              FROM nodes
            ),
            r1 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r0 ON r0.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r2 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r1 ON r1.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            r3 AS (
              SELECT nodes.node,
                     ((CASE WHEN nodes.node % 50 = 0 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
              FROM nodes LEFT JOIN (
                SELECT dst, sum(r // 3) AS s
                FROM edges JOIN r2 ON r2.node = edges.src GROUP BY dst
              ) c ON c.dst = nodes.node
            ),
            f AS (
              SELECT d.doc_id, d.source AS host, r3.r AS rank_micro
              FROM documents d JOIN r3 ON r3.node = d.doc_id
            ),
            rr AS (
              SELECT doc_id, host, rank_micro,
                     row_number() OVER (
                       PARTITION BY host ORDER BY rank_micro DESC, doc_id
                     )::BIGINT AS rank_in_host
              FROM f
            )
            SELECT doc_id, host, rank_micro, rank_in_host,
                   CAST(FLOOR((rank_in_host - 1) / 10.0) AS BIGINT) AS slot
            FROM rr ORDER BY host, rank_in_host
        """,
        "dedup_groups": """
            WITH RECURSIVE sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
            f AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, count(*) AS n FROM f GROUP BY id),
            common AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT id_a, id_b
              FROM common JOIN sizes sa ON sa.id = common.id_a
                          JOIN sizes sb ON sb.id = common.id_b
              WHERE n_common / (sa.n + sb.n - n_common) >= 0.4
            ),
            und AS (
              SELECT id_a AS u, id_b AS v FROM edges
              UNION ALL SELECT id_b, id_a FROM edges
            ),
            reach(u, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT und.v, reach.lbl FROM reach JOIN und ON und.u = reach.u
            )
            SELECT u AS doc_id, min(lbl) AS group_id
            FROM reach GROUP BY u ORDER BY doc_id
        """,
        "dedup_end_to_end": """
            WITH RECURSIVE sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
            f AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, count(*) AS n FROM f GROUP BY id),
            common AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT id_a, id_b
              FROM common JOIN sizes sa ON sa.id = common.id_a
                          JOIN sizes sb ON sb.id = common.id_b
              WHERE n_common / (sa.n + sb.n - n_common) >= 0.4
            ),
            und AS (
              SELECT id_a AS u, id_b AS v FROM edges
              UNION ALL SELECT id_b, id_a FROM edges
            ),
            reach(u, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT und.v, reach.lbl FROM reach JOIN und ON und.u = reach.u
            ),
            g AS (SELECT u AS doc_id, min(lbl) AS group_id FROM reach GROUP BY u),
            scored AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
            j AS (SELECT g.doc_id, g.group_id, s.n_tokens
                  FROM g JOIN scored s USING (doc_id)),
            k AS (SELECT group_id, doc_id AS keeper_id FROM (
                    SELECT group_id, doc_id,
                           row_number() OVER (PARTITION BY group_id
                                              ORDER BY n_tokens DESC, doc_id ASC) AS rn
                    FROM j) WHERE rn = 1)
            SELECT j.doc_id, j.group_id, (j.doc_id = k.keeper_id) AS is_keeper
            FROM j JOIN k USING (group_id) ORDER BY j.doc_id
        """,
        "dedup_keepers": """
            WITH RECURSIVE sh AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                     ))) AS shingle
              FROM documents
            ),
            keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
            f AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, count(*) AS n FROM f GROUP BY id),
            common AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
              FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT id_a, id_b
              FROM common JOIN sizes sa ON sa.id = common.id_a
                          JOIN sizes sb ON sb.id = common.id_b
              WHERE n_common / (sa.n + sb.n - n_common) >= 0.4
            ),
            und AS (
              SELECT id_a AS u, id_b AS v FROM edges
              UNION ALL SELECT id_b, id_a FROM edges
            ),
            reach(u, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT und.v, reach.lbl FROM reach JOIN und ON und.u = reach.u
            ),
            g AS (SELECT u AS doc_id, min(lbl) AS group_id FROM reach GROUP BY u),
            scored AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
            j AS (SELECT g.group_id, s.doc_id, s.n_tokens FROM g JOIN scored s USING (doc_id))
            SELECT group_id, keeper_id, n_members, best_n_tokens FROM (
              SELECT group_id, doc_id AS keeper_id,
                     count(*) OVER (PARTITION BY group_id) AS n_members,
                     max(n_tokens) OVER (PARTITION BY group_id) AS best_n_tokens,
                     row_number() OVER (PARTITION BY group_id
                                        ORDER BY n_tokens DESC, doc_id ASC) AS rn
              FROM j) WHERE rn = 1 ORDER BY group_id
        """,
        "knn_join_exact": """
            WITH l AS (
              SELECT vec_id AS id_l, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id % 25 = 0
                AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
            ),
            r AS (
              SELECT vec_id AS id_r, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
              WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
            ),
            s AS (
              SELECT id_l, id_r,
                     list_dot_product(l.v, r.v)
                       / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))) AS c
              FROM l JOIN r ON id_l != id_r
            ),
            ranked AS (
              SELECT id_l, id_r, c,
                     row_number() OVER (PARTITION BY id_l ORDER BY c DESC, id_r) AS "rank"
              FROM s
            )
            SELECT id_l, id_r, round(c, 6) AS cosine, "rank"
            FROM ranked WHERE "rank" <= 5 ORDER BY id_l, "rank"
        """,
        "hamming_near_dups": """
            WITH s AS (
              SELECT doc_id,
                     ('0x' || substr(md5(text), 1, 15))::BIGINT AS sig
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE ((a.sig >> 0)  & 65535) = ((b.sig >> 0)  & 65535)
               OR ((a.sig >> 16) & 65535) = ((b.sig >> 16) & 65535)
               OR ((a.sig >> 32) & 65535) = ((b.sig >> 32) & 65535)
               OR ((a.sig >> 48) & 65535) = ((b.sig >> 48) & 65535)
            ORDER BY id_a, id_b
        """,
        "ann_lsh_full_probe": f"""
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC LIMIT 20
        """,
        "embedding_cosine_topk": f"""
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC LIMIT 20
        """,
        "token_budget_docs": """
            SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens FROM (
              SELECT doc_id, source, n_tokens,
                     sum(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':budget-v1'), 1, 8),
                                doc_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS cum_tokens
              FROM (
                SELECT doc_id, source,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                         AS n_tokens
                FROM documents
              )
            ) WHERE cum_tokens <= 800
            ORDER BY doc_id
        """,
        "embedding_decontam_report": """
            WITH b AS (
              SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
              FROM embeddings WHERE vec_id % 100 = 0
            ), c AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id % 100 <> 0
            ), pairs AS (
              SELECT c.vec_id, b.bench_id,
                     list_dot_product(cv, bv)
                       / (sqrt(list_dot_product(cv, cv))
                          * sqrt(list_dot_product(bv, bv))) AS cos
              FROM c CROSS JOIN b
            )
            SELECT vec_id, bench_id, round(cos, 6) AS max_cosine FROM (
              SELECT vec_id, bench_id, cos,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY cos DESC, bench_id ASC
                     ) AS rn
              FROM pairs WHERE cos >= 0.25
            ) WHERE rn = 1
            ORDER BY vec_id
        """,
        "semdedup_pairs": sd_base + sd_assign + sd_pairs + """
            SELECT a_id, b_id, cid, round(cosine, 6) AS cosine
            FROM p WHERE cosine >= 0.95 ORDER BY a_id, b_id
        """,
        "semdedup_docs": sd_base + sd_assign + sd_pairs + """,
            d AS (SELECT DISTINCT b_id FROM p WHERE cosine >= 0.95)
            SELECT b.vec_id, b.label FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.b_id = b.vec_id)
            ORDER BY b.vec_id
        """,
        "c4_cleaned_docs": """
            WITH planted AS (
              SELECT doc_id,
                     concat_ws(chr(10),
                       substring(text, 1, 40) || ' end of part one.',
                       'short line',
                       'Please enable JavaScript to continue viewing.',
                       substring(text, 10, 60) || ' and so it goes!',
                       CASE WHEN doc_id % 13 = 0
                            THEN 'lorem ipsum dolor sit amet.' END,
                       CASE WHEN doc_id % 17 = 0
                            THEN 'function f() { return 1; }' END) AS text
              FROM documents),
            s AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, chr(10)),
                       x -> regexp_matches(trim(x), '[.!?"]$')
                            AND len(string_split_regex(trim(x), ' +')) >= 5
                            AND NOT contains(lower(x), 'javascript')) AS kept,
                     len(string_split(text, chr(10))) AS n_all
              FROM planted)
            SELECT doc_id,
                   array_to_string(kept, chr(10)) AS text,
                   CAST(len(kept) AS BIGINT) AS n_kept_lines,
                   CAST(n_all - len(kept) AS BIGINT) AS n_dropped_lines
            FROM s
            WHERE NOT contains(lower(text), 'lorem ipsum')
              AND NOT contains(text, '{')
              AND len(kept) >= 2
            ORDER BY doc_id
        """,
        "ivf_recall_at_k": ir_base + sd_assign + f""",
            q AS (
              SELECT vec_id AS qid, vm AS qvm,
                     list_dot_product(CAST(vm AS DOUBLE[]),
                                      CAST(vm AS DOUBLE[])) AS qn
              FROM vm WHERE vec_id % 50 = 0
            ),
            probes AS (
              SELECT qid, qvm, qn, cid FROM (
                SELECT q.qid, q.qvm, q.qn, c.cid,
                       list_reduce(list_transform(range(1, {sd_d + 1}),
                         j -> (CAST(q.qvm[j] AS DOUBLE) - c.cm[j])
                              * (CAST(q.qvm[j] AS DOUBLE) - c.cm[j])),
                         (x, y) -> x + y) AS dist
                FROM q CROSS JOIN c)
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY dist, cid) <= 2
            ),
            approx AS (
              SELECT qid, vec_id FROM (
                SELECT p.qid, n.vec_id,
                       list_dot_product(CAST(n.vm AS DOUBLE[]),
                                        CAST(p.qvm AS DOUBLE[]))
                         / (sqrt(n.nn) * sqrt(p.qn)) AS cosine
                FROM probes p JOIN n ON n.cid = p.cid
                WHERE n.nn > 0 AND p.qn > 0)
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, vec_id) <= 10
            ),
            truth AS (
              SELECT qid, vec_id FROM (
                SELECT q.qid, n.vec_id,
                       list_dot_product(CAST(n.vm AS DOUBLE[]),
                                        CAST(q.qvm AS DOUBLE[]))
                         / (sqrt(n.nn) * sqrt(q.qn)) AS cosine
                FROM q CROSS JOIN n
                WHERE n.nn > 0 AND q.qn > 0)
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, vec_id) <= 10
            )
            SELECT t.qid AS query_id,
                   count(*) AS n_truth,
                   CAST(sum(CASE WHEN ap.vec_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                   round(CAST(sum(CASE WHEN ap.vec_id IS NOT NULL
                                       THEN 1 ELSE 0 END) AS BIGINT)
                         / count(*), 6) AS recall
            FROM truth t
            LEFT JOIN approx ap ON ap.qid = t.qid AND ap.vec_id = t.vec_id
            GROUP BY t.qid ORDER BY query_id
        """,
        "host_mirror_report": """
            WITH pages AS (
              SELECT source || '.example.com' AS host, text FROM documents
              UNION ALL
              SELECT 'm.' || source || '.example.com', text
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'p.' || source || '.example.com', text
              FROM documents WHERE doc_id % 4 = 0
              UNION ALL
              SELECT 'p.' || source || '.example.com', text || ' [p-extra]'
              FROM documents WHERE doc_id % 4 = 1),
            hostfp AS (SELECT DISTINCT host, md5(text) AS fp
                       FROM pages WHERE text IS NOT NULL),
            fpok AS (SELECT fp FROM hostfp GROUP BY fp HAVING COUNT(*) <= 50),
            live AS (SELECT h.host, h.fp FROM hostfp h JOIN fpok USING (fp)),
            sizes AS (SELECT host, COUNT(*) AS n FROM live GROUP BY host),
            pairs AS (
              SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
              FROM live a JOIN live b USING (fp)
              WHERE a.host < b.host
              GROUP BY a.host, b.host
              HAVING COUNT(*) >= 2),
            scored AS (
              SELECT host_a, host_b, shared, sa.n AS n_a, sb.n AS n_b,
                     CAST(FLOOR(shared * 1000000 / LEAST(sa.n, sb.n))
                          AS BIGINT) AS containment_micro
              FROM pairs
              JOIN sizes sa ON sa.host = pairs.host_a
              JOIN sizes sb ON sb.host = pairs.host_b)
            SELECT host_a, host_b, shared, n_a, n_b, containment_micro
            FROM scored WHERE containment_micro >= 500000
            ORDER BY host_a, host_b
        """,
        "crawler_trap_report": """
            WITH pages AS (
              SELECT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url,
                     text
              FROM documents
              UNION ALL
              SELECT 'trap.example.com',
                     'https://trap.example.com/list?session=' || doc_id
                       || '&page=' || k,
                     'trap page ' || (doc_id % 3)
              FROM documents
              CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
              WHERE doc_id % 5 = 0),
            agg AS (
              SELECT host,
                     COUNT(DISTINCT url) AS n_urls,
                     COUNT(DISTINCT COALESCE(md5(text), '__null__'))
                       AS n_content,
                     COUNT(DISTINCT CASE WHEN url LIKE '%?%' THEN url END)
                       AS n_param_urls
              FROM pages GROUP BY host)
            SELECT host, n_urls, n_content, n_param_urls,
                   CAST(FLOOR((n_urls - n_content) * 1000000 / n_urls)
                        AS BIGINT) AS dup_ratio_micro,
                   (n_urls >= 10
                    AND FLOOR((n_urls - n_content) * 1000000 / n_urls)
                        >= 500000) AS is_trap
            FROM agg ORDER BY host
        """,
        "recrawl_rate_estimates": """
            WITH v AS (
              SELECT 'https://' || source || '.example.com/' || doc_id AS url,
                     1700000000 + k * 3600 * (1 + doc_id % 3) AS ts,
                     CASE WHEN k = 0 THEN FALSE
                          ELSE substr(md5('https://' || source
                            || '.example.com/' || doc_id || ':' || k), 1, 1)
                            <= '7'
                     END AS changed
              FROM documents
              CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) ks),
            g AS (
              SELECT url,
                     COUNT(*) AS n_visits,
                     CAST(LEAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END),
                                COUNT(*) - 1) AS BIGINT) AS n_changes,
                     CAST(MAX(ts) - MIN(ts) AS BIGINT) AS span_s
              FROM v GROUP BY url HAVING COUNT(*) >= 2),
            r AS (
              SELECT url, n_visits, n_changes, span_s,
                     CAST(ROUND(-LN((n_visits - 1 - n_changes + 0.5)
                                    / (n_visits - 1 + 0.5)) * 1000000)
                          AS BIGINT) AS rhat_micro
              FROM g)
            SELECT url, n_visits, n_changes, span_s, rhat_micro,
                   CASE WHEN span_s > 0
                        THEN CAST(FLOOR(rhat_micro * 86400 * (n_visits - 1)
                                        / span_s) AS BIGINT)
                   END AS changes_per_day_micro
            FROM r ORDER BY url
        """,
        "trap_aware_slots": """
            WITH pages AS (
              SELECT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url,
                     text
              FROM documents
              UNION ALL
              SELECT 'trap.example.com',
                     'https://trap.example.com/list?session=' || doc_id
                       || '&page=' || k,
                     'trap page ' || (doc_id % 3)
              FROM documents
              CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
              WHERE doc_id % 5 = 0),
            agg AS (
              SELECT host,
                     COUNT(DISTINCT url) AS n_urls,
                     COUNT(DISTINCT COALESCE(md5(text), '__null__'))
                       AS n_content
              FROM pages GROUP BY host),
            budgets AS (
              SELECT host,
                     CASE WHEN n_urls >= 10
                               AND FLOOR((n_urls - n_content) * 1000000
                                         / n_urls) >= 500000
                          THEN 1 ELSE 5 END AS host_budget
              FROM agg),
            frontier AS (
              SELECT doc_id AS url_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'trap.example.com'
                          ELSE source || '.example.com' END AS host,
                     CAST((doc_id * 37) % 91 AS BIGINT) AS prio
              FROM documents),
            j AS (
              SELECT f.url_id, f.host, f.prio,
                     CAST(COALESCE(b.host_budget, 5) AS BIGINT)
                       AS host_budget
              FROM frontier f LEFT JOIN budgets b ON b.host = f.host),
            r AS (
              SELECT *,
                     CAST(ROW_NUMBER() OVER (PARTITION BY host
                          ORDER BY prio DESC, url_id) AS BIGINT)
                       AS rank_in_host
              FROM j)
            SELECT url_id, host, prio, host_budget, rank_in_host,
                   CAST(FLOOR((rank_in_host - 1) / host_budget) AS BIGINT)
                     AS slot
            FROM r ORDER BY url_id
        """,
        "canonical_url_groups": """
            WITH pages AS (
              SELECT 'https://' || source || '.example.com/' || doc_id
                       AS url, text
              FROM documents
              UNION ALL
              SELECT 'https://m.' || source || '.example.com/' || doc_id,
                     text
              FROM documents
              UNION ALL
              SELECT 'https://' || source || '.example.com/' || doc_id
                       || '?utm_source=feed', text
              FROM documents WHERE doc_id % 2 = 0),
            obs AS (SELECT DISTINCT md5(text) AS fp, url
                    FROM pages WHERE text IS NOT NULL),
            can AS (
              SELECT fp, url AS canonical_url FROM (
                SELECT fp, url,
                       ROW_NUMBER() OVER (PARTITION BY fp
                            ORDER BY length(url), url) AS rn
                FROM obs) t
              WHERE rn = 1),
            sizes AS (SELECT fp, COUNT(*) AS n_spellings
                      FROM obs GROUP BY fp)
            SELECT obs.url, can.canonical_url, sizes.n_spellings
            FROM obs JOIN can USING (fp) JOIN sizes USING (fp)
            ORDER BY obs.url, can.canonical_url
        """,
        "url_param_profile": """
            WITH kv AS (
              SELECT source || '.example.com' AS host,
                     'https://' || source || '.example.com/a?sid=' || doc_id
                       || '&lang=' || lang || '&page=' || (doc_id % 7)
                       AS url,
                     'sid' AS param, CAST(doc_id AS VARCHAR) AS value
              FROM documents
              UNION ALL
              SELECT source || '.example.com',
                     'https://' || source || '.example.com/a?sid=' || doc_id
                       || '&lang=' || lang || '&page=' || (doc_id % 7),
                     'lang', lang
              FROM documents
              UNION ALL
              SELECT source || '.example.com',
                     'https://' || source || '.example.com/a?sid=' || doc_id
                       || '&lang=' || lang || '&page=' || (doc_id % 7),
                     'page', CAST(doc_id % 7 AS VARCHAR)
              FROM documents),
            agg AS (
              SELECT host, param,
                     COUNT(*) AS n_occurrences,
                     COUNT(DISTINCT value) AS n_distinct_values,
                     COUNT(DISTINCT url) AS n_urls
              FROM kv GROUP BY host, param)
            SELECT host, param, n_occurrences, n_distinct_values, n_urls,
                   CAST(FLOOR(n_distinct_values * 1000000 / n_occurrences)
                        AS BIGINT) AS distinct_ratio_micro,
                   (n_occurrences >= 5
                    AND FLOOR(n_distinct_values * 1000000 / n_occurrences)
                        >= 900000) AS is_session_like
            FROM agg ORDER BY host, param
        """,
        "mirror_host_clusters": """
            WITH RECURSIVE pages AS (
              SELECT source || '.example.com' AS host, text FROM documents
              UNION ALL
              SELECT 'm.' || source || '.example.com', text
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'p.' || source || '.example.com', text
              FROM documents WHERE doc_id % 4 = 0
              UNION ALL
              SELECT 'p.' || source || '.example.com', text || ' [p-extra]'
              FROM documents WHERE doc_id % 4 = 1),
            hostfp AS (SELECT DISTINCT host, md5(text) AS fp
                       FROM pages WHERE text IS NOT NULL),
            fpok AS (SELECT fp FROM hostfp GROUP BY fp HAVING COUNT(*) <= 50),
            live AS (SELECT h.host, h.fp FROM hostfp h JOIN fpok USING (fp)),
            sizes AS (SELECT host, COUNT(*) AS n FROM live GROUP BY host),
            pairs AS (
              SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
              FROM live a JOIN live b USING (fp)
              WHERE a.host < b.host
              GROUP BY a.host, b.host
              HAVING COUNT(*) >= 2),
            edges AS (
              SELECT host_a, host_b
              FROM pairs
              JOIN sizes sa ON sa.host = pairs.host_a
              JOIN sizes sb ON sb.host = pairs.host_b
              WHERE FLOOR(shared * 1000000 / LEAST(sa.n, sb.n)) >= 500000),
            und AS (
              SELECT host_a AS u, host_b AS v FROM edges
              UNION ALL SELECT host_b, host_a FROM edges),
            verts AS (SELECT DISTINCT host FROM pages
                      WHERE text IS NOT NULL),
            reach(u, lbl) AS (
              SELECT host, host FROM verts
              UNION
              SELECT und.v, reach.lbl FROM reach JOIN und ON und.u = reach.u)
            SELECT u AS host, MIN(lbl) AS cluster_id
            FROM reach GROUP BY u ORDER BY host
        """,
        "canonicalized_trap_urls": """
            SELECT source || '.example.com' AS host,
                   'https://' || source || '.example.com/a?sid=' || doc_id
                     || '&lang=' || lang || '&page=' || (doc_id % 7)
                     AS url,
                   'https://' || source || '.example.com/a?lang=' || lang
                     || '&page=' || (doc_id % 7) AS canonical_url
            FROM documents ORDER BY url
        """,
        "adaptive_recrawl_slots": """
            WITH v AS (
              SELECT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url,
                     1700000000 + k * 3600 * (1 + doc_id % 3) AS ts,
                     CASE WHEN k = 0 THEN FALSE
                          ELSE substr(md5('https://' || source
                            || '.example.com/' || doc_id || ':' || k), 1, 1)
                            <= '7'
                     END AS changed
              FROM documents
              CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) ks),
            g AS (
              SELECT url, host,
                     COUNT(*) AS n_visits,
                     CAST(LEAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END),
                                COUNT(*) - 1) AS BIGINT) AS n_changes,
                     CAST(MAX(ts) - MIN(ts) AS BIGINT) AS span_s,
                     CAST(MAX(ts) AS BIGINT) AS last_fetch_ts
              FROM v GROUP BY url, host HAVING COUNT(*) >= 2),
            r AS (
              SELECT *,
                     CAST(ROUND(-LN((n_visits - 1 - n_changes + 0.5)
                                    / (n_visits - 1 + 0.5)) * 1000000)
                          AS BIGINT) AS rhat_micro
              FROM g),
            e AS (
              SELECT url, host, last_fetch_ts,
                     CAST(1700100000 - last_fetch_ts AS BIGINT) AS age_s,
                     CASE WHEN span_s > 0
                          THEN CAST(FLOOR(rhat_micro * 86400 * (n_visits - 1)
                                          / span_s) AS BIGINT)
                     END AS changes_per_day_micro
              FROM r),
            p AS (
              SELECT *,
                     CAST(FLOOR(changes_per_day_micro * age_s / 86400)
                          AS BIGINT) AS expected_changes_micro
              FROM e),
            s AS (
              SELECT *,
                     CAST(ROW_NUMBER() OVER (PARTITION BY host
                          ORDER BY expected_changes_micro DESC, url)
                          AS BIGINT) AS rank_in_host
              FROM p)
            SELECT url, host, last_fetch_ts, age_s, changes_per_day_micro,
                   expected_changes_micro, rank_in_host,
                   CAST(FLOOR((rank_in_host - 1) / 7) AS BIGINT) AS slot
            FROM s ORDER BY url
        """,
        "soft_error_hosts": """
            WITH pages AS (
              SELECT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url,
                     CASE WHEN doc_id % 7 = 0 THEN '404 not found'
                          WHEN doc_id % 7 = 1 THEN 'Access denied'
                          ELSE text END AS text
              FROM documents),
            obs AS (
              SELECT DISTINCT host, url, md5(text) AS fp,
                     CAST(length(text) AS BIGINT) AS len
              FROM pages WHERE text IS NOT NULL),
            grp AS (
              SELECT host, fp, COUNT(DISTINCT url) AS n_urls,
                     MIN(len) AS text_len, MIN(url) AS sample_url
              FROM obs GROUP BY host, fp),
            tot AS (
              SELECT host, COUNT(DISTINCT url) AS n_host_urls
              FROM obs GROUP BY host)
            SELECT g.host, g.fp, g.n_urls, t.n_host_urls, g.text_len,
                   CAST(FLOOR(g.n_urls * 1000000 / t.n_host_urls) AS BIGINT)
                     AS share_micro,
                   g.sample_url,
                   (g.n_urls >= 3
                    AND FLOOR(g.n_urls * 1000000 / t.n_host_urls) >= 100000
                    AND g.text_len <= 64) AS is_soft_error
            FROM grp g JOIN tot t ON t.host = g.host
            ORDER BY g.host, g.fp
        """,
        "fetch_retry_states": """
            WITH v AS (
              SELECT 'https://' || source || '.example.com/' || doc_id AS url,
                     CAST(1700000000 + k * 3600 AS BIGINT) AS ts,
                     substr(md5('https://' || source || '.example.com/'
                       || doc_id || ':' || k), 1, 1) <= 'b' AS ok
              FROM documents
              CROSS JOIN (SELECT UNNEST([0, 1, 2, 3, 4]) AS k) ks),
            h AS (
              SELECT url, COUNT(*) AS n_fetches, MAX(ts) AS last_ts,
                     arg_max(ok, ts) AS last_ok,
                     MAX(CASE WHEN ok THEN ts END) AS last_success_ts
              FROM v GROUP BY url),
            s AS (
              SELECT v.url, COUNT(*) AS streak
              FROM v JOIN h ON h.url = v.url
              WHERE h.last_success_ts IS NULL OR v.ts > h.last_success_ts
              GROUP BY v.url),
            p AS (
              SELECT h.url, h.n_fetches, h.last_ts, h.last_ok,
                     h.last_success_ts,
                     CAST(COALESCE(s.streak, 0) AS BIGINT) AS fail_streak
              FROM h LEFT JOIN s ON s.url = h.url)
            SELECT url, n_fetches, last_ts, last_ok, last_success_ts,
                   fail_streak,
                   CASE WHEN last_ok THEN 'healthy'
                        WHEN fail_streak >= 3 THEN 'dead'
                        ELSE 'retry' END AS state,
                   CASE WHEN NOT last_ok AND fail_streak < 3
                        THEN last_ts + LEAST(
                          600 * CAST(POWER(2, fail_streak - 1) AS BIGINT),
                          1800)
                   END AS next_retry_ts
            FROM p ORDER BY url
        """,
        "cdx_capture_index": """
            SELECT 'com,example,' || source || ')/' || doc_id
                     || '?ref=' || (doc_id % 5) AS surt,
                   CAST(1700000000 + doc_id AS BIGINT) AS ts,
                   'https://www.' || source || '.example.com/' || doc_id
                     || '?ref=' || (doc_id % 5) AS url,
                   md5(text) AS digest,
                   CAST(strlen(text) AS BIGINT) AS length_bytes
            FROM documents ORDER BY surt, ts
        """,
        "host_url_churn": """
            WITH old_u AS (
              SELECT DISTINCT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url
              FROM documents),
            new_u AS (
              SELECT DISTINCT source || '.example.com' AS host,
                     'https://' || source || '.example.com/' || doc_id AS url
              FROM documents WHERE doc_id % 7 <> 0
              UNION
              SELECT DISTINCT source || '.example.com',
                     'https://' || source || '.example.com/n' || doc_id
              FROM documents WHERE doc_id % 3 = 0),
            j AS (
              SELECT COALESCE(o.host, n.host) AS host,
                     (o.url IS NOT NULL) AS in_old,
                     (n.url IS NOT NULL) AS in_new
              FROM old_u o FULL OUTER JOIN new_u n
                ON o.host = n.host AND o.url = n.url),
            g AS (
              SELECT host,
                     COUNT(CASE WHEN in_old AND NOT in_new THEN 1 END)
                       AS n_removed,
                     COUNT(CASE WHEN in_new AND NOT in_old THEN 1 END)
                       AS n_added,
                     COUNT(CASE WHEN in_old AND in_new THEN 1 END) AS n_kept
              FROM j GROUP BY host)
            SELECT host,
                   n_removed + n_kept AS n_old,
                   n_added + n_kept AS n_new,
                   n_added, n_removed, n_kept,
                   CAST(FLOOR((n_added + n_removed) * 1000000
                              / (n_kept + n_added + n_removed)) AS BIGINT)
                     AS churn_micro
            FROM g ORDER BY host
        """,
        "host_rate_violations": """
            WITH v AS (
              SELECT source || '.example.com' AS host,
                     1700000000 + doc_id AS ts
              FROM documents
              UNION ALL
              SELECT source || '.example.com', 1700000000 + doc_id + 7
              FROM documents WHERE doc_id % 3 = 0),
            w AS (
              SELECT host, CAST(FLOOR(ts / 60) AS BIGINT) AS wdw,
                     COUNT(*) AS n
              FROM v GROUP BY host, wdw)
            SELECT host,
                   CAST(SUM(n) AS BIGINT) AS n_fetches,
                   COUNT(*) AS n_windows,
                   CAST(MAX(n) AS BIGINT) AS max_per_window,
                   CAST(SUM(GREATEST(n - 1, 0)) AS BIGINT) AS n_violations,
                   CAST(FLOOR(SUM(GREATEST(n - 1, 0)) * 1000000 / SUM(n))
                        AS BIGINT) AS violation_share_micro
            FROM w GROUP BY host ORDER BY host
        """,
        "crawl_plan_etas": """
            WITH f AS (
              SELECT doc_id AS url_id, source || '.example.com' AS host,
                     CAST((doc_id * 37) % 91 AS BIGINT) AS prio
              FROM documents),
            r AS (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY host
                     ORDER BY prio DESC, url_id) AS BIGINT) AS rank_in_host
              FROM f),
            s AS (
              SELECT *, CAST(FLOOR((rank_in_host - 1) / 4) AS BIGINT) AS slot
              FROM r)
            SELECT url_id, host, prio, rank_in_host, slot,
                   CAST(CASE WHEN host LIKE '%1.example.com' THEN 30
                        ELSE 5 END AS BIGINT) AS delay_s,
                   CAST(1700000000 + slot *
                        (CASE WHEN host LIKE '%1.example.com' THEN 30
                         ELSE 5 END) AS BIGINT) AS eta_ts
            FROM s ORDER BY url_id
        """,
        "host_entropy_rollup": """
            WITH chars AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, length(text) + 1),
                                           i -> text[i])) AS ch
              FROM documents
              WHERE text IS NOT NULL AND length(text) >= 1),
            pc AS (
              SELECT doc_id, ch, count(*)::BIGINT AS c
              FROM chars GROUP BY doc_id, ch),
            pd AS (
              SELECT doc_id,
                     sum(c)::BIGINT AS n_chars,
                     sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000, 0)
                              AS BIGINT))::BIGINT AS s_micro
              FROM pc GROUP BY doc_id),
            ent AS (
              SELECT d.doc_id, d.source,
                     coalesce(p.n_chars, 0) AS n_chars,
                     CAST(round(ln(CAST(p.n_chars AS DOUBLE)) * 1000000
                                - CAST(p.s_micro AS DOUBLE) / p.n_chars, 0)
                          AS BIGINT) AS entropy_micro
              FROM documents d LEFT JOIN pd p USING (doc_id))
            SELECT source || '.example.com' AS host,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   CAST(FLOOR(SUM(entropy_micro) / COUNT(entropy_micro))
                        AS BIGINT) AS mean_entropy_micro,
                   MIN(entropy_micro) AS min_entropy_micro,
                   MAX(entropy_micro) AS max_entropy_micro,
                   COUNT(CASE WHEN entropy_micro < 2000000 THEN 1 END)
                     AS n_low_entropy
            FROM ent GROUP BY host ORDER BY host
        """,
        "scd2_url_history": """
            WITH base AS (
              SELECT 'https://' || source || '.example.com/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     doc_id AS d, text, lang
              FROM documents
            ), log AS (
              SELECT url, 1700000000 + d AS ts, 'I' AS op, text, lang,
                     d*10 AS row_idx FROM base
              UNION ALL
              SELECT url, 1700000000 + d, 'U', 'DUP:' || text, lang,
                     d*10 + 1 FROM base WHERE d % 7 = 0
              UNION ALL
              SELECT url, 1700000000 + d + 500, 'U',
                     CASE WHEN d % 7 = 0 THEN 'DUP:' || text ELSE text END,
                     lang, d*10 + 2 FROM base WHERE d % 4 = 1
              UNION ALL
              SELECT url, 1700000000 + d + 1000, 'U', 'EDIT:' || text, lang,
                     d*10 + 3 FROM base WHERE d % 3 = 0
              UNION ALL
              SELECT url, 1700000000 + d + 2000, 'D', NULL, NULL,
                     d*10 + 4 FROM base WHERE d % 5 = 0
              UNION ALL
              SELECT url, 1700000000 + d + 3000, 'I', 'NEW:' || text, lang,
                     d*10 + 5 FROM base WHERE d % 15 = 0
            ), lww AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY url, ts
                                             ORDER BY row_idx DESC) AS rn
                FROM log) WHERE rn = 1
            ), opened AS (
              SELECT *, CASE WHEN op = 'D'
                              OR lag(op) OVER w IS NULL
                              OR lag(op) OVER w = 'D'
                              OR NOT (text IS NOT DISTINCT FROM lag(text) OVER w
                                      AND lang IS NOT DISTINCT FROM lag(lang) OVER w)
                         THEN 1 ELSE 0 END AS opener
              FROM lww WINDOW w AS (PARTITION BY url ORDER BY ts)
            ), grouped AS (
              SELECT *, SUM(opener) OVER (PARTITION BY url ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS grp
              FROM opened
            ), survivors AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY url, grp
                                             ORDER BY ts) AS grn
                FROM grouped) WHERE grn = 1
            ), hist AS (
              SELECT url, ts AS valid_from,
                     lead(ts) OVER (PARTITION BY url ORDER BY ts) AS valid_to,
                     op, text, lang
              FROM survivors
            )
            SELECT url, valid_from, valid_to,
                   valid_to IS NULL AS is_current, text, lang
            FROM hist WHERE op <> 'D'
            ORDER BY url, valid_from
        """,
        "expectations_audit": """
            WITH t AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN (lang IN ('en','de','es','fr'))
                                   IS NOT TRUE THEN 1 ELSE 0 END) AS BIGINT) AS v1,
                     CAST(sum(CASE WHEN (length(text) >= 120)
                                   IS NOT TRUE THEN 1 ELSE 0 END) AS BIGINT) AS v2,
                     CAST(sum(CASE WHEN (n_chars = length(text))
                                   IS NOT TRUE THEN 1 ELSE 0 END) AS BIGINT) AS v3,
                     CAST(sum(CASE WHEN (CAST(substr(source, 4) AS INT) < 10)
                                   IS NOT TRUE THEN 1 ELSE 0 END) AS BIGINT) AS v4
              FROM documents)
            SELECT 'lang_latin' AS rule, 'drop' AS "action", n AS n_rows,
                   v1 AS n_violations, n - v1 AS n_passed FROM t
            UNION ALL
            SELECT 'text_min_120', 'dlq', n, v2, n - v2 FROM t
            UNION ALL
            SELECT 'chars_consistent', 'warn', n, v3, n - v3 FROM t
            UNION ALL
            SELECT 'source_low', 'warn', n, v4, n - v4 FROM t
        """,
        "zorder_pruning_report": f"""
            WITH pts AS (
              SELECT doc_id % 256 AS x, (doc_id * 37 + 11) % 256 AS y
              FROM documents
            ), coded AS (
              SELECT x, y, {z_expr} AS zc,
                     ((x & 255) << 8) | (y & 255) AS lexc
              FROM pts
            ), zb AS (
              SELECT zc >> 10 AS b, count(*) AS nr,
                     min(y) AS mny, max(y) AS mxy
              FROM coded GROUP BY 1
            ), lb AS (
              SELECT lexc >> 10 AS b, count(*) AS nr,
                     min(y) AS mny, max(y) AS mxy
              FROM coded GROUP BY 1
            )
            SELECT 'lex' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(sum(CASE WHEN mxy >= 0 AND mny <= 31 THEN 1 ELSE 0 END)
                        AS BIGINT) AS buckets_touched,
                   CAST(sum(CASE WHEN mxy >= 0 AND mny <= 31 THEN nr ELSE 0 END)
                        AS BIGINT) AS rows_touched,
                   CAST(sum(nr) AS BIGINT) AS rows_total
            FROM lb
            UNION ALL
            SELECT 'zorder', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN mxy >= 0 AND mny <= 31 THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(sum(CASE WHEN mxy >= 0 AND mny <= 31 THEN nr ELSE 0 END)
                        AS BIGINT),
                   CAST(sum(nr) AS BIGINT)
            FROM zb
            ORDER BY layout
        """,
        "partial_update_resolution": """
            WITH base AS (
              SELECT 'https://' || source || '.example.com/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     doc_id AS d, text, lang
              FROM documents
            ), state AS (
              SELECT url, 'STATE:' || text AS text, lang
              FROM base WHERE d % 2 = 0
            ), batch AS (
              SELECT url, 1000 + d*10 + 0 AS ts, 'U' AS op,
                     CASE WHEN d % 3 = 0 THEN '__elided__'
                          ELSE 'NEW:' || text END AS text,
                     CASE WHEN d % 5 = 0 THEN '__elided__'
                          ELSE lang END AS lang,
                     d*10 + 0 AS row_idx
              FROM base
              UNION ALL
              SELECT url, 1000 + d*10 + 1, 'U', '__elided__', 'xx',
                     d*10 + 1 FROM base WHERE d % 4 = 0
              UNION ALL
              SELECT url, 1000 + d*10 + 2, 'D', NULL, NULL,
                     d*10 + 2 FROM base WHERE d % 6 = 0
              UNION ALL
              SELECT url, 1000 + d*10 + 3, 'I', '__elided__', 're',
                     d*10 + 3 FROM base WHERE d % 12 = 0
            ), carried AS (
              SELECT url, ts, op, row_idx,
                     last_value(
                       CASE WHEN text IS NULL OR text <> '__elided__'
                            THEN {'v': text} END IGNORE NULLS) OVER w AS ct,
                     last_value(
                       CASE WHEN lang IS NULL OR lang <> '__elided__'
                            THEN {'v': lang} END IGNORE NULLS) OVER w AS cl
              FROM batch
              WINDOW w AS (PARTITION BY url ORDER BY ts, row_idx
                           ROWS UNBOUNDED PRECEDING)
            )
            SELECT c.url, c.ts, c.op,
                   CASE WHEN c.ct IS NULL THEN s.text ELSE c.ct.v END AS text,
                   CASE WHEN c.cl IS NULL THEN s.lang ELSE c.cl.v END AS lang
            FROM carried c LEFT JOIN state s ON c.url = s.url
            ORDER BY c.url, c.ts
        """,
        "events_versioned_join": """
            WITH log AS (
              SELECT 'k' || CAST(doc_id AS VARCHAR) AS key,
                     doc_id * 100 AS ts, 'I' AS op,
                     substr(text, 1, 40) AS content
              FROM documents
              UNION ALL
              SELECT 'k' || CAST(doc_id AS VARCHAR), doc_id * 100 + 30, 'U',
                     'EDIT:' || substr(text, 1, 40)
              FROM documents
              UNION ALL
              SELECT 'k' || CAST(doc_id AS VARCHAR), doc_id * 100 + 60, 'D',
                     NULL
              FROM documents WHERE doc_id % 4 = 0
            ), hist AS (
              SELECT key, ts AS valid_from,
                     lead(ts) OVER (PARTITION BY key ORDER BY ts) AS valid_to,
                     op, content
              FROM log
            ), h AS (
              SELECT key, valid_from, valid_to, content
              FROM hist WHERE op <> 'D'
            ), ev AS (
              SELECT event_id,
                     'k' || CAST(event_id % 500 AS VARCHAR) AS key,
                     (event_id % 500) * 100 + event_id % 100 AS lookup_ts
              FROM events
            )
            SELECT e.event_id, e.key, e.lookup_ts,
                   CASE WHEN h.valid_to IS NULL OR e.lookup_ts < h.valid_to
                        THEN h.valid_from END AS version_from,
                   CASE WHEN h.valid_to IS NULL OR e.lookup_ts < h.valid_to
                        THEN h.content END AS content
            FROM ev e ASOF LEFT JOIN h
              ON e.key = h.key AND e.lookup_ts >= h.valid_from
            ORDER BY e.event_id
        """,
        "winnowing_dups": """
            WITH docs AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_transform(range(1, length(n) - 8 + 2),
                                    i -> substr(n, i::INT, 8)) AS grams
              FROM docs WHERE length(n) >= 8
            ), h AS (
              SELECT doc_id,
                     list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 12))::BIGINT) AS hs
              FROM g
            ), m AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                       j -> list_min(hs[j:j+3]))) AS fps
              FROM h WHERE len(hs) >= 4
            ), fp AS (
              SELECT doc_id, unnest(fps) AS fp FROM m
            ), posting AS (
              SELECT fp, count(*) AS dfreq, list(doc_id) AS ids
              FROM fp GROUP BY fp
            ), b AS (
              SELECT fp, unnest(ids) AS id_a, ids
              FROM posting WHERE dfreq <= 64
            ), p AS (
              SELECT id_a, unnest(ids) AS id_b FROM b
            )
            SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
            FROM p WHERE id_a < id_b
            GROUP BY id_a, id_b HAVING count(*) >= 2
            ORDER BY id_a, id_b
        """,
        "winnowing_screened_docs": """
            WITH docs AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_transform(range(1, length(n) - 8 + 2),
                                    i -> substr(n, i::INT, 8)) AS grams
              FROM docs WHERE length(n) >= 8
            ), h AS (
              SELECT doc_id,
                     list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 12))::BIGINT) AS hs
              FROM g
            ), m AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                       j -> list_min(hs[j:j+3]))) AS fps
              FROM h WHERE len(hs) >= 4
            ), fp AS (
              SELECT doc_id, unnest(fps) AS fp FROM m
            ), corpus AS (
              SELECT doc_id, fp FROM fp WHERE doc_id % 4 <> 0
            ), hot AS (
              SELECT fp FROM corpus GROUP BY fp HAVING count(*) > 64
            ), store AS (
              SELECT doc_id, fp FROM corpus
              WHERE fp NOT IN (SELECT fp FROM hot)
            ), probe AS (
              SELECT doc_id, fp FROM fp WHERE doc_id % 4 = 0
            )
            SELECT p.doc_id AS batch_id, s.doc_id AS corpus_id,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM probe p JOIN store s USING (fp)
            GROUP BY batch_id, corpus_id HAVING count(*) >= 2
            ORDER BY batch_id, corpus_id
        """,
    }
