"""Boilerplate line removal (operators/boilerplate.py): mining
threshold, order-preserving rebuild, within-doc repeats counted once,
reusable mined set, and the single-exchange rebuild plan."""

from pyspark.sql import Row, functions as F

from csv_cruncher_spark.operators import boilerplate

DOCS = [
    (1, "COOKIE BANNER\nreal content one\nFOOTER\nmore real text"),
    (2, "COOKIE BANNER\nreal content two\nFOOTER"),
    (3, "COOKIE BANNER\nunique stuff here"),
    # within-doc repeat of a unique line: must NOT count as cross-doc
    (4, "only here\nonly here\nsomething else"),
    (5, "entirely original document"),
]


def _docs(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def test_mining_threshold_and_distinct_docs(spark):
    df = _docs(spark)
    b2 = {r["line"]: r["n_docs"]
          for r in boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()}
    assert b2 == {"COOKIE BANNER": 3, "FOOTER": 2}
    # 'only here' repeats within doc 4 only -> 1 distinct doc -> excluded
    b3 = {r["line"] for r in
          boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=3).collect()}
    assert b3 == {"COOKIE BANNER"}


def test_removal_preserves_order_and_counts(spark):
    df = _docs(spark)
    out = {r["doc_id"]: r for r in
           boilerplate.remove_boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()}
    assert out[1]["text"] == "real content one\nmore real text"
    assert out[1]["n_kept_lines"] == 2 and out[1]["n_removed_lines"] == 2
    assert out[2]["text"] == "real content two"
    assert out[4]["text"] == "only here\nonly here\nsomething else"
    assert out[4]["n_removed_lines"] == 0
    assert set(out) == {1, 2, 3, 4, 5}


def test_all_boilerplate_doc_survives_empty(spark):
    df = _docs(spark).unionByName(
        _docs(spark).sparkSession.createDataFrame(
            [Row(doc_id=6, text="COOKIE BANNER\nFOOTER")]
        )
    )
    out = {r["doc_id"]: r for r in
           boilerplate.remove_boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()}
    assert out[6]["text"] == "" and out[6]["n_kept_lines"] == 0


def test_premined_set_reused_across_batches(spark):
    df = _docs(spark)
    mined = boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=2)
    batch = df.sparkSession.createDataFrame(
        [Row(doc_id=99, text="COOKIE BANNER\nnew arrival")]
    )
    out = boilerplate.remove_boilerplate_lines(
        batch, "doc_id", "text", boiler=mined
    ).collect()
    assert out[0]["text"] == "new arrival" and out[0]["n_removed_lines"] == 1


def test_dedup_paragraphs_keep_first_semantics(spark):
    """Keep-first across docs AND within a doc; first occurrence =
    lowest (doc_id, position); unique paragraphs untouched."""
    rows = [
        Row(doc_id=1, text="alpha\n\nshared para\n\nbeta"),
        # cross-doc repeat: doc 2's copy of 'shared para' is dropped
        Row(doc_id=2, text="shared para\n\ngamma"),
        # within-doc repeat: second 'twice' dropped even with no other doc
        Row(doc_id=3, text="twice\n\ndelta\n\ntwice"),
        Row(doc_id=4, text="entirely original"),
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate.dedup_paragraphs(
            spark.createDataFrame(rows), "doc_id", "text"
        ).collect()
    }
    assert out[1]["text"] == "alpha\n\nshared para\n\nbeta"
    assert out[1]["n_removed_paras"] == 0
    assert out[2]["text"] == "gamma"
    assert out[2]["n_kept_paras"] == 1 and out[2]["n_removed_paras"] == 1
    assert out[3]["text"] == "twice\n\ndelta"
    assert out[3]["n_removed_paras"] == 1
    assert out[4]["text"] == "entirely original"


def test_dedup_paragraphs_min_chars_exemption(spark):
    """Paragraphs under min_chars are exempt: every occurrence survives
    (structural stubs must not collapse to one global survivor)."""
    rows = [
        Row(doc_id=1, text="ok\n\nlong enough paragraph"),
        Row(doc_id=2, text="ok\n\nlong enough paragraph"),
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate.dedup_paragraphs(
            spark.createDataFrame(rows), "doc_id", "text", min_chars=5
        ).collect()
    }
    # 'ok' (2 chars) exempt in both docs; the long paragraph deduped
    assert out[1]["text"] == "ok\n\nlong enough paragraph"
    assert out[2]["text"] == "ok" and out[2]["n_removed_paras"] == 1


def test_dedup_paragraphs_winner_is_aggregation_not_window(spark):
    """Plan shape: the first-occurrence winner comes from a
    partial-combinable HashAggregate on the md5 fingerprint — no Window
    operator anywhere (a window over the paragraph key would serialize
    the corpus's most-repeated paragraph into one task)."""
    df = _docs(spark)
    out = boilerplate.dedup_paragraphs(df, "doc_id", "text", sep="\n")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_rebuild_is_single_exchange(spark):
    """The rebuild aggregates once on the doc id: exactly one
    hash-partitioning exchange on the line stream side (the mined-set
    side may shuffle for its own aggregation — that frame is tiny)."""
    df = _docs(spark)
    mined = boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=2)
    out = boilerplate.remove_boilerplate_lines(df, "doc_id", "text", boiler=mined)
    plan = out._jdf.queryExecution().executedPlan().toString()
    id_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "id#" in ln.split("hashpartitioning")[1].split(",")[0]
    ]
    assert len(id_exchanges) == 1, plan


def test_null_text_docs_survive_with_empty_text(spark):
    """A NULL-text document must not vanish from the rebuilds: both
    remove_boilerplate_lines and dedup_paragraphs emit it as empty text
    with 0/0 counts (posexplode_outer placeholder row, counted in
    neither tally)."""
    rows = [
        Row(doc_id=1, text="COOKIE BANNER\nreal one"),
        Row(doc_id=2, text="COOKIE BANNER\nreal two"),
        Row(doc_id=3, text=None),
    ]
    df = spark.createDataFrame(rows)
    rb = {r["doc_id"]: r for r in
          boilerplate.remove_boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()}
    assert set(rb) == {1, 2, 3}
    assert rb[3]["text"] == "" and rb[3]["n_kept_lines"] == 0 and rb[3]["n_removed_lines"] == 0
    assert rb[1]["text"] == "real one" and rb[1]["n_removed_lines"] == 1
    dp = {r["doc_id"]: r for r in
          boilerplate.dedup_paragraphs(df, "doc_id", "text", sep="\n").collect()}
    assert set(dp) == {1, 2, 3}
    assert dp[3]["text"] == "" and dp[3]["n_kept_paras"] == 0 and dp[3]["n_removed_paras"] == 0
    assert dp[2]["text"] == "real two" and dp[2]["n_removed_paras"] == 1
    # the mined set must not contain a NULL 'line' from placeholder rows
    mined = boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=1)
    assert all(r["line"] is not None for r in mined.collect())
