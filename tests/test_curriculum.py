"""build_curriculum (operators/curriculum.py): the one-call
quality → percentile → cap → pack → shuffle composition. Stage semantics
are each pinned by their own suites (test_ranking / test_packing /
test_shuffle) and the composed result is DuckDB-oracled
(curriculum_docs); here: composition wiring, determinism under layout,
and the payload-never-rides-a-window plan contract."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import curriculum


def _docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(5 + i % 17)),
         "en" if i % 3 else "de", f"s{i % 4}", "payload " * 40)
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, blob string"
    )


def test_composition_and_determinism_under_layout(spark):
    df = _docs(spark)
    out = curriculum.build_curriculum(
        df, "doc_id", "text", stratum_col="lang", source_col="source",
        keep_fraction=0.5, cap_k=10, budget=32, n_shards=4, epoch=1,
        shuffle_shards=8,
    )
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    assert rows, "selection kept something"
    # survivors clear their language's median (ties kept)
    kept_ids = {r["doc_id"] for r in rows}
    assert len(kept_ids) == len(rows), "one row per doc"
    # global positions are a permutation 0..n-1
    assert sorted(r["global_pos"] for r in rows) == list(range(len(rows)))
    # chunk geometry is consistent with the budget
    for r in rows:
        assert r["first_chunk"] == r["start_offset"] // 32
        assert r["last_chunk"] >= r["first_chunk"]
    # bit-identical under a different input layout
    again = sorted(
        curriculum.build_curriculum(
            df.repartition(13), "doc_id", "text", stratum_col="lang",
            source_col="source", keep_fraction=0.5, cap_k=10, budget=32,
            n_shards=4, epoch=1, shuffle_shards=8,
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows == again


def test_windows_and_joins_never_carry_payload(spark):
    out = curriculum.build_curriculum(
        _docs(spark), "doc_id", "text", stratum_col="lang",
        source_col="source", keep_fraction=0.5, cap_k=10, budget=32,
        n_shards=4, epoch=1, shuffle_shards=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        head = line.lstrip(" :+-")
        if head.startswith(("Window", "Sort", "Exchange", "WindowGroupLimit")):
            assert "blob#" not in line and "text#" not in line, line


def test_cap_requires_source_col(spark):
    with pytest.raises(ValueError, match="source_col"):
        curriculum.build_curriculum(
            _docs(spark), "doc_id", "text", stratum_col="lang", cap_k=5
        )


def test_fractional_score_not_truncated(spark):
    """A user-supplied float quality score keeps its type: with scores
    in (0,1), keep_fraction=0.5 must actually halve the corpus (the
    former long cast truncated every score to 0, keeping everything)."""
    df = _docs(spark).withColumn(
        "quality", (F.col("doc_id") % 10 + 1) / 10.0
    )
    out = curriculum.build_curriculum(
        df, "doc_id", "text", keep_fraction=0.5, budget=32,
        n_shards=4, shuffle_shards=8, score=F.col("quality"),
    ).collect()
    assert 0 < len(out) < 60, len(out)  # the filter actually bit
    kept_scores = {r["score"] for r in out}
    assert all(isinstance(s, float) and 0 < s <= 1 for s in kept_scores)
    # top-half semantics: every kept score >= every dropped score's bound
    assert min(kept_scores) >= 0.6
