"""BM25 full-text retrieval — bit-reproducible Okapi scoring at corpus scale.

The missing query-side primitive of a training-data engine: given the
corpus the pipeline just built, find the documents most relevant to a
textual query — dataset debugging ("show me what matched 'nuclear
reactor'"), targeted-domain curation (seed-query retrieval a la DSIR's
target sets), and eval-set construction all reduce to batch top-k
retrieval. The reference engine's search surface stops at SQL LIKE
(HsqldbFacade.kt:1 — no ranking of any kind); this is the ranked
counterpart, built as pure DataFrame algebra.

Scoring is Okapi BM25 (Robertson & Sparck Jones; the Lucene-default
k1=1.2, b=0.75 rational parameters):

    score(q, d) = sum_{t in q} idf(t) * tf * (k1+1)
                                / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )      # Lucene form,
                                                        # always >= 0

Why it is bit-reproducible (and therefore fully DuckDB-oracle-able):
- idf is quantized ONCE to integer micro-units — ``round(ln(...)·10^6)``
  — the module family's established transcendental-score trick
  (textstats.tfidf_keywords, unigram_logprob).
- ``avgdl`` never materializes as a double: with k1 = 6/5 and b = 3/4
  the term denominator ``tf + 0.3 + 0.9·dl·N/T`` (avgdl = T/N) is
  multiplied through by ``10·T``, giving the EXACT int64 pair
      num = 22 · tf · T
      den = 10·T·tf + 3·T + 9·dl·N
  so each per-(query, doc, token) term is ``round(idf_micro · num/den)``
  — two IEEE double ops (one divide, one multiply) on identical int64
  operands in either engine, then one rounding. Per-pair scores are
  int64 SUMS of those terms: exact and order-independent, so any
  partitioning yields the same ranking and DuckDB agrees bit-for-bit.
- int64-exactness bound (documented like the Zipf fit): ``num`` stays
  exact while 22·tf·T < 2^63 — with per-doc tf ≤ 10^4 that is a corpus
  of ~4·10^13 tokens (≈ 40 T tokens); past that, scale T down by a
  fixed power of 10 on both engines (a monotone transform — identical
  ranking).

Scale shape (the 100-TB story):
- ONE pass builds the per-(doc, token) tf frame (map-side combined);
  doc lengths fold from it with a second narrow agg. No text column
  survives past tokenization.
- The query set is small by contract (a query workload, not a corpus):
  its distinct tokens broadcast, so df/idf are computed ONLY for query
  tokens — an agg over the inverted index FILTERED by the broadcast,
  never a full-vocabulary statistics job.
- Top-k per query is the bounded collect_list/sort/slice partial
  aggregation (state ≤ per-query candidate count), never a global
  window over the corpus.

Reference provenance: no counterpart in the reference (its README
advertises plain SQL over CSV, README.md:31); this is part of the
training-data extension surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .bpe import _sql_str
from .textstats import TOKEN_REGEX

__all__ = ["bm25_topk", "bm25_term_sql"]

# Okapi parameters as exact rationals: k1 = 6/5, b = 3/4. These are
# baked into the integer algebra below (22 = 10·(k1+1), 3 = 10·k1·(1−b),
# 9 = 10·k1·b) — changing them means changing the three literals in
# lockstep, so they are module constants rather than function kwargs.
_K1_NUM = 22  # 10 * (k1 + 1)
_K1_CONST = 3  # 10 * k1 * (1 - b)
_K1_DL = 9  # 10 * k1 * b


def bm25_term_sql(tf: str, dl: str, idf_micro: str, n_docs: str, total_tokens: str) -> str:
    """The per-(query, doc, token) BM25 term in integer micro-units, as
    ONE shared SQL string executed verbatim by both Spark (``F.expr``)
    and the generated DuckDB oracle — same parse tree, same
    left-associated double arithmetic (the classifier module's
    cross-engine pattern). All five inputs are int64 column names."""
    num = f"({_K1_NUM} * {tf} * {total_tokens})"
    den = (
        f"(10 * {total_tokens} * {tf} + {_K1_CONST} * {total_tokens}"
        f" + {_K1_DL} * {dl} * {n_docs})"
    )
    return (
        f"CAST(ROUND({idf_micro} * (CAST({num} AS DOUBLE)"
        f" / CAST({den} AS DOUBLE))) AS BIGINT)"
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    pattern: str = TOKEN_REGEX,
) -> DataFrame:
    """Batch top-``k`` BM25 retrieval: for every row of ``queries``,
    the ``k`` highest-scoring documents. Returns (query_id, rank
    1-based, id, score_micro), rank ordered by (score DESC, id ASC) —
    deterministic under score ties for any orderable id type.

    Query tokens are DISTINCT per query (the standard
    qtf-free Okapi form; a token repeated in the query scores once).
    Documents sharing no token with a query are absent, as are queries
    with no in-corpus token. ``N`` counts every row of ``docs``
    (token-less documents lengthen nothing but do dilute idf — the
    collection-size convention); ``T`` is the corpus token total.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    toks = F.expr(f"regexp_extract_all(lower({text_col}), {_sql_str(pattern)}, 0)")
    per = (
        docs.select(F.col(id_col).alias("__doc"), F.explode(toks).alias("token"))
        .groupBy("__doc", "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dl = per.groupBy("__doc").agg(F.sum("__tf").alias("__dl"))
    # collection constants: one row each, broadcast onto every term
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    totals = dl.agg(F.sum("__dl").alias("__t"))

    qtoks = F.expr(
        f"regexp_extract_all(lower({query_text_col}), {_sql_str(pattern)}, 0)"
    )
    qtok = queries.select(
        F.col(query_id_col).alias("__q"),
        F.explode(F.array_distinct(qtoks)).alias("token"),
    )

    # df/idf for QUERY tokens only: the broadcast filter keeps the
    # statistics agg proportional to the matched slice of the inverted
    # index, never the full vocabulary
    qvocab = qtok.select("token").distinct()
    dfreq = (
        per.join(F.broadcast(qvocab), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        F.round(
            F.log(
                (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("__idf"),
    )

    matched = (
        per.join(F.broadcast(qtok), "token")
        .join(F.broadcast(idf), "token")
        .join(dl, "__doc")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(totals))
    )
    term = F.expr(bm25_term_sql("__tf", "__dl", "__idf", "__n", "__t"))
    scored = matched.select("__q", "__doc", term.alias("__term")).groupBy(
        "__q", "__doc"
    ).agg(F.sum("__term").alias("score_micro"))

    # bounded top-k per query: partial-combined sort/slice agg on the
    # narrow (query, doc, score) frame — tfidf_keywords' shape
    top = scored.groupBy("__q").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("score_micro")).alias("neg"),
                        F.col("__doc").alias("doc"),
                        F.col("score_micro").alias("score_micro"),
                    )
                )
            ),
            1,
            k,
        ).alias("__hits")
    )
    return top.select(
        F.col("__q").alias(query_id_col),
        F.posexplode("__hits").alias("__pos", "__hit"),
    ).select(
        query_id_col,
        (F.col("__pos") + 1).cast("long").alias("rank"),
        F.col("__hit.doc").alias(id_col),
        F.col("__hit.score_micro").alias("score_micro"),
    )
