"""Domain-blocklist URL filtering (UT1 / safe-crawl style).

Production crawl pipelines screen every candidate URL against a
blocklist of domains where a match on ANY registrable suffix blocks the
whole subtree: blocking ``example.com`` must block
``ads.tracker.example.com``. The naive formulation — a LIKE / regex
per blocklist row — is a nested-loop over corpus × blocklist and dies
at web scale. Two Spark-first shapes here, picked by blocklist size:

- **literal path** (blocklist is a Python sequence — config-file scale,
  ≤ ~10k entries): the list becomes ONE literal array and the match is
  ``exists(suffixes, s -> array_contains(lit, s))`` — a pure
  projection, ZERO shuffles, zero joins; every row is screened in the
  map task that read it.
- **join path** (blocklist is a DataFrame — UT1 scale, millions of
  entries): explode each host into its label-boundary suffix set
  (bounded by the label count, ~4-6 per host) on a NARROW (row-id,
  suffix) projection, broadcast equi-join against the blocklist to get
  the hit row-id set, then one join back on the uniform synthetic
  row-id key. The payload crosses one skew-free exchange; the
  blocklist (even UT1's ~4M entries is tens of MB) broadcasts; the
  per-row work is O(labels), never O(blocklist).

Cross-engine exactness: suffix-set membership on label boundaries is
equivalent to ``host = d OR host LIKE '%.' || d``, which is how the
DuckDB oracle states it — two spellings of the same predicate, so the
entry is fully oracled with no quantization.

Reference parity: csv-cruncher has no URL surface; this is new-engine
crawl-side admission control for the webtext payload, the sibling of
`operators/bloom.py` (seen-before) and `operators/dedup.py
admission_screen` (near-dup).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host

# above this, a literal-array scan per row beats no one — callers with
# big lists should pass a DataFrame (join path)
LITERAL_BLOCKLIST_LIMIT = 10_000


def host_suffixes(host: str | Column) -> Column:
    """Array of label-boundary suffixes of a host, longest first:
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com]. Pure JVM expression (split + transform + slice); NULL host →
    NULL array."""
    c = F.col(host) if isinstance(host, str) else host
    parts = F.split(c, "\\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def _bare_lower_host(url_col: str) -> Column:
    # port-free host: a blocklist names domains, not ports
    return F.regexp_replace(url_host(F.col(url_col)), ":[0-9]+$", "")


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: Sequence[str] | DataFrame,
    keep: str = "allowed",
) -> DataFrame:
    """Screen rows whose ``url_col`` host falls under any blocked domain.

    A host is blocked when it equals a blocklist entry or ends with
    ``"." + entry`` (label-boundary suffix match — ``notexample.com``
    is NOT blocked by ``example.com``). ``blocked_domains`` is a small
    Python sequence (literal zero-shuffle path, capped at
    LITERAL_BLOCKLIST_LIMIT) or a 1-column DataFrame named ``domain``
    (broadcast-join path for UT1-scale lists).

    keep='allowed' returns surviving rows, keep='blocked' the
    screened-out rows, keep='flag' all rows plus a boolean ``blocked``
    column. Rows whose URL has no parseable host are never blocked
    (they carry no domain to match) — the conservative posture for a
    filter that feeds deletion.
    """
    if keep not in ("allowed", "blocked", "flag"):
        raise ValueError(f"keep must be allowed|blocked|flag, got {keep!r}")
    host = _bare_lower_host(url_col)
    sfx = host_suffixes(host)

    if not isinstance(blocked_domains, DataFrame):
        domains = sorted({d.lower() for d in blocked_domains})
        if len(domains) > LITERAL_BLOCKLIST_LIMIT:
            raise ValueError(
                f"literal blocklist of {len(domains)} entries exceeds "
                f"{LITERAL_BLOCKLIST_LIMIT}; pass a DataFrame for the "
                f"broadcast-join path"
            )
        lit_block = F.array(*[F.lit(d) for d in domains])
        blocked = F.when(host.isNull(), F.lit(False)).otherwise(
            F.exists(sfx, lambda s: F.array_contains(lit_block, s))
        )
        flagged = df.withColumn("blocked", blocked)
    else:
        block = blocked_domains.select(
            F.lower(F.col("domain")).alias("domain")
        ).distinct()
        rid = F.monotonically_increasing_id()
        with_rid = df.withColumn("__rid", rid)
        # narrow (rid, suffix) projection only — payload stays behind
        hit_ids = (
            with_rid.select("__rid", F.explode(sfx).alias("domain"))
            .join(F.broadcast(block), "domain")
            .select("__rid")
            .distinct()
            .withColumn("blocked", F.lit(True))
        )
        flagged = (
            with_rid.join(hit_ids, "__rid", "left")
            .withColumn("blocked", F.coalesce("blocked", F.lit(False)))
            .drop("__rid")
        )

    if keep == "flag":
        return flagged
    if keep == "blocked":
        return flagged.filter(F.col("blocked")).drop("blocked")
    return flagged.filter(~F.col("blocked")).drop("blocked")
