"""Politeness-aware crawl-frontier scheduling: assign every frontier URL
a fetch slot such that no host serves more than ``per_host_budget``
fetches per slot, higher-priority URLs fetch first, and the assignment
is a pure function of the input (re-runnable, resumable mid-crawl).

This is the dispatch half of the focused-crawl loop whose scoring half
is ``graph.pagerank_micro`` (crawl_frontier_rank /
personalized_crawl_rank): PageRank says WHAT to fetch next, this says
WHEN — the per-host rate limit is the politeness contract every real
crawler honours, and at 10^10 frontier URLs the host key is the most
skewed key in the system (a handful of platforms own most of the web).

Scale shape — the naive plan is ``row_number() OVER (PARTITION BY host
ORDER BY priority DESC)`` on the full frame: one task sorts the giant
host's entire payload. Instead:

1. the schedule is computed on the NARROW (host, priority, id)
   projection and joined back by the unique id (the repo's payload-free
   window discipline, ``ranking.cap_per_group``);
2. rank-in-host decomposes exactly into
   ``offset(host, priority) + tie_rank`` where ``offset`` is the count
   of strictly-higher-priority rows — a per-(host, priority) COUNT
   aggregation (map-side combined) plus a cumulative sum over the
   AGGREGATED frame (one row per distinct (host, priority), so the
   host-partitioned window sorts group counts, not rows), and
   ``tie_rank`` is a window over (host, priority) — partitions the size
   of a single tie class. With continuous priority scores (the
   realistic case: they come from PageRank), tie classes are ~1 row and
   NOTHING big is ever sorted in one task. The honest bound: a discrete
   priority with a giant tie class re-concentrates the tie window; feed
   scores, not grades (docstring contract, asserted in tests via the
   plan).

Cross-engine: every output column is integer arithmetic on counts and
ranks — the DuckDB oracle replays it with a plain ROW_NUMBER and must
agree bit-for-bit (tests + driver entry ``crawl_schedule_slots``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "crawl_schedule",
    "focused_crawl_plan",
    "change_rate_estimates",
    "trap_aware_schedule",
    "adaptive_recrawl_plan",
    "fetch_retry_plan",
    "host_rate_audit",
    "schedule_eta",
]


def crawl_schedule(
    frontier: DataFrame,
    host_col: str,
    priority_col: str,
    id_col: str,
    per_host_budget: int = 10,
    budget_col: str | None = None,
) -> DataFrame:
    """Schedule ``frontier`` rows into fetch slots.

    Returns the input columns plus:

      rank_in_host  1-based fetch order within the host
                    (priority DESC, id ASC — total and deterministic)
      slot          0-based time slot: floor((rank_in_host - 1) /
                    per_host_budget); at most ``per_host_budget`` URLs
                    of a host share a slot

    ``budget_col``: optional per-HOST budget column on ``frontier``
    (every row of a host must carry the same positive value — the
    trap-aware path, :func:`trap_aware_schedule`, derives it from a
    host-level report so this holds by construction). When given, the
    slot divisor is ``coalesce(budget_col, per_host_budget)`` row-wise;
    ``per_host_budget`` stays the default for hosts the budget frame
    didn't cover. Rank computation is unchanged — budgets shape WHEN a
    host's queue drains, not its internal order.

    Equivalent to ``row_number() OVER (PARTITION BY host ORDER BY
    priority DESC, id)`` with NULLS-LAST priority order (both engines'
    default) but computed skew-safely (module docstring). A NULL host
    forms its own partition and a NULL priority its own (last) tie
    class — rows are never dropped. ``id_col`` must be unique AND
    non-null: it keys the join-back, so a NULL id cannot be matched
    back to its row (same contract as ``ranking.cap_per_group``)."""
    if per_host_budget <= 0:
        raise ValueError(f"per_host_budget must be positive, got {per_host_budget}")
    narrow = frontier.select(
        F.col(host_col).alias("__host"),
        F.col(priority_col).alias("__prio"),
        F.col(id_col).alias("__id"),
    )
    # one row per (host, priority): how many rows share this priority
    counts = narrow.groupBy("__host", "__prio").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # rows strictly before this tie class = running sum of higher classes
    w_off = (
        Window.partitionBy("__host")
        .orderBy(F.col("__prio").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select(
        F.col("__host").alias("__ohost"),
        F.col("__prio").alias("__oprio"),
        "__offset",
    )
    # rank within the tie class by id (partitions = one tie class each);
    # null-safe join keys so NULL-host/NULL-priority rows keep their rank
    w_tie = Window.partitionBy("__host", "__prio").orderBy(F.col("__id").asc())
    ranked = (
        narrow.withColumn("__tie", F.row_number().over(w_tie))
        .join(
            offsets,
            F.col("__host").eqNullSafe(F.col("__ohost"))
            & F.col("__prio").eqNullSafe(F.col("__oprio")),
        )
        .select(
            "__id",
            (F.col("__offset") + F.col("__tie")).cast("long").alias("rank_in_host"),
        )
    )
    out = frontier.join(
        ranked, frontier[id_col] == ranked["__id"]
    ).drop("__id")
    divisor = (
        F.coalesce(F.col(budget_col).cast("long"), F.lit(per_host_budget))
        if budget_col is not None
        else F.lit(per_host_budget)
    )
    return out.withColumn(
        "slot",
        F.floor((F.col("rank_in_host") - 1) / divisor).cast("long"),
    )


def focused_crawl_plan(
    frontier: DataFrame,
    id_col: str,
    host_col: str,
    seeds: DataFrame,
    iterations: int = 3,
    out_degree: int = 3,
    damping_pct: int = 85,
    per_host_budget: int = 10,
    edges: DataFrame | None = None,
) -> DataFrame:
    """The whole focused-crawl loop in one call: score the frontier with
    personalized PageRank from ``seeds`` (graph.pagerank_micro —
    teleport mass lands only on the seed set, so rank concentrates in
    its link neighbourhood), then dispatch with :func:`crawl_schedule`
    (priority = rank, per-host politeness budget). Returns
    (id, host, rank_micro, rank_in_host, slot) — a complete, replayable
    fetch plan that is a pure function of (frontier, seeds).

    Both stages keep their individual scale shapes: the PageRank
    iterations are long-only equi-joins + partial aggregations, the
    scheduling is the decomposed payload-free rank. One composition,
    one oracle (driver entry ``focused_crawl_schedule``)."""
    from .graph import pagerank_micro

    ranks = pagerank_micro(
        frontier,
        id_col,
        out_degree=out_degree,
        iterations=iterations,
        damping_pct=damping_pct,
        edges=edges,
        seeds=seeds,
    )
    scored = (
        frontier.select(id_col, host_col)
        .join(ranks, frontier[id_col] == ranks["node"])
        .select(id_col, host_col, "rank_micro")
    )
    return crawl_schedule(
        scored, host_col, "rank_micro", id_col, per_host_budget
    )


def change_rate_estimates(
    visits: DataFrame,
    url_col: str,
    ts_col: str,
    changed_col: str,
) -> DataFrame:
    """Per-URL change-rate estimation from a revisit history — the
    adaptive half of recrawl planning (`sitemap.recrawl_plan` handles
    hosts that PUBLISH freshness; this estimates it for the long tail
    that doesn't).

    Input: one row per completed fetch — (url, fetch timestamp, and a
    boolean "the content differed from the previous fetch of this url",
    which is exactly what `snapshot.snapshot_diff` labels `changed`).
    Assuming Poisson page changes sampled at roughly regular intervals,
    the bias-reduced estimator of Cho & Garcia-Molina ("Estimating
    Frequency of Change", ACM TOIT 2003, eq. for the irregular-access
    estimator's regular special case) for the per-visit change
    probability is

        r_hat = -ln((n - X + 0.5) / (n + 0.5))

    with n = revisit count (visits after the first) and X = detected
    changes; the rate per unit time is r_hat / mean_interval. Output:

      url
      n_visits             total fetches observed
      n_changes            changes detected (first fetch never counts)
      span_s               max(ts) - min(ts), seconds (int64)
      rhat_micro           round(1e6 * r_hat) — int64 micro-nats per
                           revisit; the ln is quantized ONCE (the
                           pmi/entropy micro discipline) so both
                           engines agree bit-for-bit
      changes_per_day_micro  floor(rhat_micro * 86400 * (n_visits - 1)
                           / span_s) — the recrawl priority: expected
                           changes per day at the observed cadence;
                           exact int64 arithmetic after the one
                           quantized ln

    URLs with fewer than 2 visits have no interval evidence and are
    excluded (the recrawl planner treats never-revisited URLs as
    `stale` by age, not by rate). A zero span (all visits share one
    timestamp) yields NULL changes_per_day_micro rather than a division
    blow-up; rhat_micro still carries the per-visit evidence.

    Scale: ONE map-combined aggregation on the url key; the ln and all
    derived measures are projections on the aggregated frame. Per-url
    history is bounded by the crawler's own revisit policy, so no key
    is hot. The first fetch of a url cannot be a "change" — rows where
    `changed_col` is true are still counted in X only up to n (X is
    clamped to n, keeping the estimator's log argument positive even on
    malformed histories that mark the first fetch changed).
    """
    g = (
        visits.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).cast("long").alias("__ts"),
            F.col(changed_col).cast("int").alias("__ch"),
        )
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.sum("__ch").alias("__x_raw"),
            F.min("__ts").alias("__t0"),
            F.max("__ts").alias("__t1"),
        )
        .filter(F.col("n_visits") >= 2)
    )
    n_re = F.col("n_visits") - 1  # revisits: fetches that could detect a change
    x = F.least(F.coalesce(F.col("__x_raw"), F.lit(0)).cast("long"), n_re)
    rhat = F.round(
        -F.log(
            (n_re.cast("double") - x + 0.5) / (n_re.cast("double") + 0.5)
        )
        * 1_000_000
    ).cast("bigint")
    span = (F.col("__t1") - F.col("__t0")).cast("long")
    out = g.select(
        "url",
        "n_visits",
        x.alias("n_changes"),
        span.alias("span_s"),
        rhat.alias("rhat_micro"),
    )
    return out.withColumn(
        "changes_per_day_micro",
        F.when(
            F.col("span_s") > 0,
            F.floor(
                F.col("rhat_micro")
                * F.lit(86400)
                * (F.col("n_visits") - 1)
                / F.col("span_s")
            ).cast("bigint"),
        ),
    )


def trap_aware_schedule(
    frontier: DataFrame,
    host_col: str,
    priority_col: str,
    id_col: str,
    pages: DataFrame,
    pages_host_col: str,
    pages_url_col: str,
    pages_text_col: str,
    per_host_budget: int = 10,
    trap_budget: int = 1,
    min_urls: int = 10,
    min_dup_ratio_micro: int = 500_000,
) -> DataFrame:
    """Close the trap → politeness loop in one call: run
    ``mirrors.crawler_trap_report`` over the already-crawled ``pages``,
    throttle every flagged host to ``trap_budget`` fetches per slot, and
    schedule ``frontier`` with :func:`crawl_schedule` under the
    per-host budgets (default budget for unflagged and never-seen
    hosts). A crawler trap (one host, unbounded URL space, bounded
    content) stops monopolizing the fetch pipeline without being
    blocklisted outright — the ``trap_budget`` trickle keeps sampling
    it in case it reforms.

    Scale shape: the trap report is one host aggregation (host-count
    rows, tiny); its flagged-host frame joins the frontier BROADCAST on
    the host key, so the frontier never reshuffles for the budget —
    then the schedule runs its usual payload-free decomposed rank.

    Returns crawl_schedule's columns plus ``host_budget`` (the divisor
    actually applied to the row). Driver entry ``trap_aware_slots``
    oracles the whole composition: report → CASE budget → ROW_NUMBER
    replay."""
    from .mirrors import crawler_trap_report

    if trap_budget <= 0 or per_host_budget <= 0:
        raise ValueError(
            f"budgets must be positive, got per_host_budget="
            f"{per_host_budget}, trap_budget={trap_budget}"
        )
    report = crawler_trap_report(
        pages, pages_host_col, pages_url_col, pages_text_col,
        min_urls=min_urls, min_dup_ratio_micro=min_dup_ratio_micro,
    )
    budgets = report.select(
        F.col("host").alias("__bhost"),
        F.when(F.col("is_trap"), F.lit(trap_budget))
        .otherwise(F.lit(per_host_budget))
        .cast("long")
        .alias("host_budget"),
    )
    with_budget = frontier.join(
        F.broadcast(budgets),
        frontier[host_col] == budgets["__bhost"],
        "left",
    ).drop("__bhost").withColumn(
        "host_budget",
        F.coalesce(F.col("host_budget"), F.lit(per_host_budget).cast("long")),
    )
    return crawl_schedule(
        with_budget, host_col, priority_col, id_col,
        per_host_budget=per_host_budget, budget_col="host_budget",
    )


def adaptive_recrawl_plan(
    visits: DataFrame,
    url_col: str,
    ts_col: str,
    changed_col: str,
    now_ts: int,
    per_host_budget: int = 10,
) -> DataFrame:
    """Turn a fetch history directly into a prioritized, politeness-
    bounded recrawl schedule — the adaptive half of recrawl planning as
    ONE call (`sitemap.recrawl_plan` covers hosts that PUBLISH
    freshness; this covers the long tail that doesn't):

    1. :func:`change_rate_estimates` mines the per-URL change rate from
       the revisit history (Cho & Garcia-Molina, one quantized ln).
    2. The recrawl priority is the expected number of changes since the
       last fetch: ``expected_changes_micro = floor(
       changes_per_day_micro * age_s / 86400)`` with ``age_s = now_ts -
       last_fetch_ts`` — exact int64 after the estimator's one
       quantized ln, so the whole plan stays value-hash oracled.
    3. :func:`crawl_schedule` dispatches URLs into per-host fetch slots
       ordered by that priority (skew-safe decomposed rank, at most
       ``per_host_budget`` URLs of a host per slot).

    ``now_ts`` is an explicit epoch-seconds instant supplied by the
    caller (a plan is always "as of" a moment; implicit clocks break
    replay). URLs with a single fetch — or a zero observation span —
    carry no rate evidence: their priority is NULL and they sort LAST
    within their host (both engines' DESC NULLS LAST default), after
    every URL the estimator can actually rank. A ``now_ts`` earlier
    than a fetch yields a negative age and a negative priority —
    deliberately: the row stays schedulable and sorts below genuinely
    stale pages.

    Output: url, host (via `functions.urls.url_host`), last_fetch_ts,
    age_s, changes_per_day_micro, expected_changes_micro, rank_in_host,
    slot.

    Scale: ONE aggregation over the history on the url key computes
    both the estimator inputs and the last-fetch instant (no second
    pass over the raw visits); everything after is projections plus the
    schedule's narrow decomposed rank — page payloads never enter.
    """
    from ..functions.urls import url_host

    est = change_rate_estimates(visits, url_col, ts_col, changed_col)
    last = (
        visits.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).cast("long").alias("__ts"),
        )
        .groupBy("url")
        .agg(F.max("__ts").alias("last_fetch_ts"))
    )
    state = (
        last.join(est.select("url", "changes_per_day_micro"), "url", "left")
        .withColumn(
            "age_s",
            (F.lit(now_ts).cast("long") - F.col("last_fetch_ts")),
        )
        .withColumn(
            "expected_changes_micro",
            F.floor(
                F.col("changes_per_day_micro") * F.col("age_s") / F.lit(86400)
            ).cast("bigint"),
        )
        .withColumn("host", url_host(F.col("url")))
    )
    return crawl_schedule(
        state, "host", "expected_changes_micro", "url",
        per_host_budget=per_host_budget,
    )


def fetch_retry_plan(
    log: DataFrame,
    url_col: str,
    ts_col: str,
    ok_col: str,
    max_attempts: int = 5,
    base_delay_s: int = 300,
    max_delay_s: int = 86_400,
) -> DataFrame:
    """Turn a raw fetch log into a per-URL retry/backoff plan — the
    failure-handling half of the crawl loop (the success half flows
    into `change_rate_estimates`): URLs whose LAST fetch succeeded are
    healthy; URLs with ``max_attempts`` or more consecutive trailing
    failures are declared dead (pruned from the frontier); everything
    in between gets an exponential-backoff retry instant.

    Input: one row per fetch attempt — (url, epoch-seconds timestamp,
    boolean success). Fetch timestamps must be unique per URL (a real
    fetcher cannot hit one URL twice in the same second; a failure
    sharing the exact instant of the last success does NOT count toward
    the streak). Output, one row per URL:

      url, n_fetches, last_ts, last_ok
      last_success_ts   NULL when the URL never succeeded
      fail_streak       consecutive failures since the last success
                        (0 when the last fetch succeeded)
      state             'healthy' | 'retry' | 'dead'
      next_retry_ts     last_ts + min(base_delay_s * 2^(fail_streak-1),
                        max_delay_s); NULL unless state = 'retry'.
                        The power of two is exact int64 (max_attempts
                        is capped at 40 so 2^(streak-1) never leaves
                        the double-exact integer range either engine
                        computes it in).

    Scale: two map-combined aggregations over the narrow (url, ts, ok)
    projection — the per-URL head (count / max / max_by / conditional
    max) and the trailing-failure count, which joins the raw narrow
    frame to the url-keyed head on the uniform url key and counts rows
    after the last success. Payloads never enter; no windows; per-URL
    history is bounded by the crawler's own attempt policy.
    """
    if not (1 <= max_attempts <= 40):
        raise ValueError(
            f"max_attempts must be in [1, 40], got {max_attempts}"
        )
    if base_delay_s < 1 or max_delay_s < base_delay_s:
        raise ValueError(
            f"need 1 <= base_delay_s <= max_delay_s, got "
            f"{base_delay_s}, {max_delay_s}"
        )
    narrow = log.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(ok_col).cast("boolean").alias("__ok"),
    )
    head = narrow.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.max("__ts").alias("last_ts"),
        F.max_by("__ok", "__ts").alias("last_ok"),
        F.max(F.when(F.col("__ok"), F.col("__ts"))).alias("last_success_ts"),
    )
    streaks = (
        narrow.join(
            head.select(
                F.col("url").alias("__surl"),
                F.col("last_success_ts").alias("__ls"),
            ),
            F.col("url") == F.col("__surl"),
        )
        .filter(F.col("__ls").isNull() | (F.col("__ts") > F.col("__ls")))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("__streak"))
    )
    out = (
        head.join(streaks, "url", "left")
        .withColumn(
            "fail_streak",
            F.coalesce(F.col("__streak"), F.lit(0)).cast("bigint"),
        )
        .drop("__streak")
    )
    delay = F.least(
        (
            F.lit(base_delay_s)
            * F.pow(F.lit(2.0), F.col("fail_streak") - 1).cast("long")
        ),
        F.lit(max_delay_s).cast("long"),
    )
    state = (
        F.when(F.col("last_ok"), F.lit("healthy"))
        .when(F.col("fail_streak") >= F.lit(max_attempts), F.lit("dead"))
        .otherwise(F.lit("retry"))
    )
    return out.withColumn("state", state).withColumn(
        "next_retry_ts",
        F.when(
            F.col("state") == "retry", (F.col("last_ts") + delay)
        ).cast("bigint"),
    )


def host_rate_audit(
    log: DataFrame,
    host_col: str,
    ts_col: str,
    window_s: int = 60,
    max_per_window: int = 10,
) -> DataFrame:
    """Audit a fetch log against a per-host rate cap — the compliance
    check for the politeness contract :func:`crawl_schedule` plans
    (plans drift when fetchers retry, hosts redirect, or several
    crawlers share a frontier; this measures what actually happened).

    The rate is measured on a fixed grid: fetch instants bucket into
    ``floor(ts / window_s)`` windows, and a window holding more than
    ``max_per_window`` fetches contributes its excess to the host's
    violation count. The grid formulation (rather than a sliding
    window) is deliberate: it is ONE aggregation, exactly replayable in
    any engine, and a crawler that respects the grid cap can exceed an
    ideal sliding cap only by the boundary factor 2x — the standard
    fixed-window rate-limiter contract.

    One row per host:

      host
      n_fetches         total fetches observed
      n_windows         distinct grid windows touched
      max_per_window    the busiest window's fetch count
      n_violations      sum over windows of max(0, count - cap)
      violation_share_micro  floor(1e6 * n_violations / n_fetches)

    Scale: two map-combined aggregations — (host, window) then (host);
    a platform host is a big GROUP, never a sorted window; NULL ts rows
    carry no instant and drop.
    """
    if window_s < 1 or max_per_window < 1:
        raise ValueError(
            f"need window_s >= 1 and max_per_window >= 1, got "
            f"{window_s}, {max_per_window}"
        )
    per_window = (
        log.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(host_col).alias("host"),
            F.floor(F.col(ts_col).cast("long") / F.lit(window_s)).alias(
                "__w"
            ),
        )
        .groupBy("host", "__w")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return per_window.groupBy("host").agg(
        F.sum("__n").cast("bigint").alias("n_fetches"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.max("__n").cast("bigint").alias("max_per_window"),
        F.sum(
            F.greatest(F.col("__n") - F.lit(max_per_window), F.lit(0))
        ).cast("bigint").alias("n_violations"),
    ).withColumn(
        "violation_share_micro",
        F.floor(
            F.col("n_violations") * F.lit(1_000_000) / F.col("n_fetches")
        ).cast("bigint"),
    )


def schedule_eta(
    schedule: DataFrame,
    host_col: str,
    slot_col: str = "slot",
    delays: DataFrame | None = None,
    default_delay_s: int = 1,
    t0: int = 0,
) -> DataFrame:
    """Materialize a :func:`crawl_schedule` plan into fetch INSTANTS:
    ``eta_ts = t0 + slot * delay_s`` where ``delay_s`` is the host's
    crawl delay (robots.txt Crawl-delay, or an operator policy). A slot
    is "the k-th politeness window of this host"; multiplying by the
    host's own delay turns the unitless plan into a dispatchable
    timeline without re-ranking anything.

    ``delays``: optional (host, delay_s) frame — hosts absent from it
    (or a NULL delay) use ``default_delay_s``. ``t0`` is the explicit
    epoch-seconds start instant (plans are "as of" a moment; implicit
    clocks break replay).

    Scale: the delay frame is host-cardinality — it BROADCASTS; the
    schedule never reshuffles. Pure projection otherwise.
    """
    if default_delay_s < 1:
        raise ValueError(
            f"default_delay_s must be >= 1, got {default_delay_s}"
        )
    if delays is not None:
        d = delays.select(
            F.col("host").alias("__dhost"),
            F.col("delay_s").cast("long").alias("__delay"),
        )
        out = schedule.join(
            F.broadcast(d),
            F.col(host_col).eqNullSafe(F.col("__dhost")),
            "left",
        ).drop("__dhost")
    else:
        out = schedule.withColumn("__delay", F.lit(None).cast("long"))
    return out.withColumn(
        "delay_s", F.coalesce(F.col("__delay"), F.lit(default_delay_s))
    ).drop("__delay").withColumn(
        "eta_ts",
        (F.lit(t0).cast("long") + F.col(slot_col) * F.col("delay_s"))
        .cast("bigint"),
    )


def apportion_budget(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    total_budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer crawl
    budget across keys, proportional to int64 weights — the step between
    RANKING hosts (``graph.pagerank_weighted``) and SCHEDULING them
    (:func:`crawl_schedule` / :func:`trap_aware_schedule`): "we can
    afford ``total_budget`` fetches this cycle; how many does each host
    get?". Returns (key, weight, quota) with ``SUM(quota) ==
    total_budget`` EXACTLY whenever any weight is positive.

    The method: base quota ``(w*B) div R`` (R = Σw), then the L = B −
    Σbase leftover units go to the L largest remainders ``(w*B) mod R``
    (ties by key ascending) — the classic apportionment that is exact,
    monotone in weight for fixed others, and integer-only, so a DuckDB
    oracle replays it bit-for-bit.

    Contracts: ``key_col`` unique and non-null (one quota row per key;
    duplicates are NOT merged — aggregate weights first). NULL or
    non-positive weights are clamped to 0 (quota 0, never a bonus). If
    ALL weights are 0 the budget is unallocatable and every quota is 0
    (documented degenerate case, no division by zero). int64 headroom:
    ``max_weight * total_budget < 2^63``.

    Scale shape: two 1-row aggregates attached via crossJoin(broadcast)
    (the bounded scalar-attach shape); the leftover assignment needs a
    GLOBAL rank of remainders — done with ``ranking.global_rank``
    (range-repartitioned per-partition row_number + O(partitions)
    offsets), never a single-task ORDER BY window. The whole frame
    stays narrow (key, weight, base, rem).

    Why at least L remainders are positive when R > 0: Σrem = L·R and
    every rem < R, so more than L rows have rem > 0 — the bonus never
    reaches a zero remainder; the explicit ``rem > 0`` guard only
    matters for the all-zero-weight degenerate case.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    from .ranking import global_rank

    b = int(total_budget)
    narrow = df.select(
        F.col(key_col).alias("__key"),
        F.greatest(
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)), F.lit(0)
        ).alias("__w"),
    )
    tot = narrow.agg(F.sum("__w").alias("__R"))
    x = narrow.crossJoin(F.broadcast(tot)).select(
        "__key",
        "__w",
        # nullif guards the all-zero-weight degenerate case under ANSI
        # (div/% by zero throw); coalesce folds it to the documented 0
        F.coalesce(F.expr(f"(__w * {b}) div nullif(__R, 0)"), F.lit(0)).alias(
            "__base"
        ),
        F.coalesce(F.expr(f"(__w * {b}) % nullif(__R, 0)"), F.lit(0)).alias(
            "__rem"
        ),
    )
    leftover = x.agg((F.lit(b) - F.sum("__base")).cast("long").alias("__L"))
    ranked = global_rank(
        x.crossJoin(F.broadcast(leftover)),
        order="__rem",
        key_col="__key",
        rank_col="__rank",
        descending=True,
    )
    return ranked.select(
        F.col("__key").alias(key_col),
        F.col("__w").alias(weight_col),
        (
            F.col("__base")
            + F.when(
                (F.col("__rank") <= F.col("__L")) & (F.col("__rem") > 0),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("quota"),
    )
