"""Sequence packing (operators/packing.py): exact offsets on known
input, boundary spanning, empty docs, append stability, layout
independence, and the one-exchange plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import packing


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_pack_exact_offsets_and_spanning(spark):
    # one shard; budget 10; docs of 4, 5, 3, 7 tokens
    rows = [(0, 4), (8, 5), (16, 3), (24, 7)]
    out = packing.pack_sequences(
        _df(spark, rows), "doc_id", "n_tok", budget=10, n_shards=1
    )
    got = {
        r["doc_id"]: (r["shard"], r["start_offset"], r["first_chunk"], r["last_chunk"])
        for r in out.collect()
    }
    assert got[0] == (0, 0, 0, 0)  # tokens 0-3
    assert got[8] == (0, 4, 0, 0)  # tokens 4-8
    assert got[16] == (0, 9, 0, 1)  # tokens 9-11: SPANS the boundary
    assert got[24] == (0, 12, 1, 1)  # tokens 12-18


def test_pack_empty_doc_degenerate(spark):
    out = packing.pack_sequences(
        _df(spark, [(1, 3), (2, 0), (3, 2)]),
        "doc_id",
        "n_tok",
        budget=4,
        n_shards=1,
    )
    got = {r["doc_id"]: (r["start_offset"], r["first_chunk"], r["last_chunk"]) for r in out.collect()}
    assert got[2] == (3, 0, 0)  # zero tokens: occupies no space, spans nothing
    assert got[3] == (3, 0, 1)  # next doc starts where the empty one did


def test_pack_append_stability_and_sharding(spark):
    """Appending docs with larger ids must not move existing docs, and
    shards are independent streams."""
    base = [(i, (i % 5) + 1) for i in range(40)]
    out1 = packing.pack_sequences(
        _df(spark, base), "doc_id", "n_tok", budget=16, n_shards=4
    )
    out2 = packing.pack_sequences(
        _df(spark, base + [(i, 3) for i in range(40, 60)]),
        "doc_id",
        "n_tok",
        budget=16,
        n_shards=4,
    )
    a = {r["doc_id"]: (r["shard"], r["start_offset"]) for r in out1.collect()}
    b = {
        r["doc_id"]: (r["shard"], r["start_offset"])
        for r in out2.filter(F.col("doc_id") < 40).collect()
    }
    assert a == b
    # per-shard offsets are contiguous: sum of tokens == max(start+n)
    tot = {s: sum(n for i, n in base if i % 4 == s) for s in range(4)}
    ends = (
        out1.groupBy("shard")
        .agg(F.max(F.col("start_offset")).alias("m"))
        .collect()
    )
    for r in ends:
        # the last doc's start + its tokens == shard total
        last = max((i for i, n in base if i % 4 == r["shard"]))
        last_n = dict(base)[last]
        assert r["m"] + last_n == tot[r["shard"]]


def test_pack_layout_independent(spark):
    df = _df(spark, [(i, (i * 7) % 9 + 1) for i in range(200)])
    a = packing.pack_sequences(df, "doc_id", "n_tok", 32, 8).collect()
    b = packing.pack_sequences(
        df.repartition(13), "doc_id", "n_tok", 32, 8
    ).collect()
    key = lambda rows: {  # noqa: E731
        r["doc_id"]: (r["shard"], r["start_offset"], r["first_chunk"], r["last_chunk"])
        for r in rows
    }
    assert key(a) == key(b)


def test_pack_plan_one_exchange(spark):
    df = _df(spark, [(i, 2) for i in range(50)])
    plan = (
        packing.pack_sequences(df, "doc_id", "n_tok", 8, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_pack_input_validation(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "n_tok", 0, 1)
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "n_tok", 8, 0)


# ---------------------------------------------------------------------------
# chunk_documents — sliding token windows (per-doc, pure projection)
# ---------------------------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x"),               # 1 token
            (3, None),              # NULL text
            (4, ""),                # empty text -> one empty-ish chunk
        ],
        "doc_id long, text string",
    )


def test_chunk_non_overlapping_default(spark):
    out = packing.chunk_documents(_docs(spark), "doc_id", "text", size=3)
    got = {
        (r["doc_id"], r["chunk_no"]): (
            r["start_token"], r["n_chunk_tokens"], r["chunk_text"]
        )
        for r in out.collect()
    }
    # doc 1: 7 tokens, size=stride=3 -> windows at 1, 4, 7
    assert got[(1, 0)] == (1, 3, "a b c")
    assert got[(1, 1)] == (4, 3, "d e f")
    assert got[(1, 2)] == (7, 1, "g")
    assert got[(2, 0)] == (1, 1, "x")


def test_chunk_overlapping_stride(spark):
    out = packing.chunk_documents(
        _docs(spark), "doc_id", "text", size=4, stride=2
    )
    rows = {
        (r["doc_id"], r["chunk_no"]): (r["start_token"], r["chunk_text"])
        for r in out.collect()
    }
    # doc 1: starts 1,3,5,7 (grid runs to n_tokens inclusive)
    assert rows[(1, 0)] == (1, "a b c d")
    assert rows[(1, 1)] == (3, "c d e f")
    assert rows[(1, 2)] == (5, "e f g")
    assert rows[(1, 3)] == (7, "g")


def test_chunk_null_and_empty_docs_survive(spark):
    out = packing.chunk_documents(_docs(spark), "doc_id", "text", size=3)
    got = {
        r["doc_id"]: (r["chunk_no"], r["n_chunk_tokens"], r["chunk_text"])
        for r in out.where(F.col("doc_id").isin(3, 4)).collect()
    }
    # NULL text -> a single empty chunk (0 tokens); empty string -> the
    # degenerate one-empty-token split
    assert got[3] == (0, 0, "")
    assert got[4] == (0, 1, "")
    # no doc id ever vanishes
    assert out.select("doc_id").distinct().count() == 4


def test_chunk_plan_is_pure_projection(spark):
    out = packing.chunk_documents(_docs(spark), "doc_id", "text", size=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Sort " not in plan and "Window" not in plan, plan


def test_chunk_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        packing.chunk_documents(df, "doc_id", "text", size=0)
    with pytest.raises(ValueError):
        packing.chunk_documents(df, "doc_id", "text", size=4, stride=0)


def test_chunk_metachar_separator_is_literal(spark):
    # '|' must split literally (review finding: regex split vs literal
    # join garbled every metachar separator)
    df = spark.createDataFrame([(1, "a|b|c|d")], "doc_id long, text string")
    out = packing.chunk_documents(df, "doc_id", "text", size=2, sep="|")
    got = {r["chunk_no"]: (r["n_chunk_tokens"], r["chunk_text"]) for r in out.collect()}
    assert got == {0: (2, "a|b"), 1: (2, "c|d")}
    with pytest.raises(ValueError):
        packing.chunk_documents(df, "doc_id", "text", size=2, sep="")
