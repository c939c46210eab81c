"""Deterministic hash sampling / splitting (operators/sampling.py).

The properties that make these operators trustworthy for corpus
construction: partition-layout independence, nested thresholds,
leakage-safe split stability under data growth, and a shuffle-free plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_cruncher_spark.operators import sampling


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["en", "de", "fr", "zh"]]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_sample_is_partition_layout_independent(spark):
    df = _docs(spark)
    ids = lambda d: {r[0] for r in d.select("doc_id").collect()}  # noqa: E731
    a = ids(sampling.hash_sample(df, "doc_id", 0.3))
    b = ids(sampling.hash_sample(df.repartition(17, "lang"), "doc_id", 0.3))
    c = ids(sampling.hash_sample(df.coalesce(1), "doc_id", 0.3))
    assert a == b == c
    # a different salt draws an independent sample
    d = ids(sampling.hash_sample(df, "doc_id", 0.3, salt="other"))
    assert d != a
    # binomial sanity: 0.3 of 2000 within 5 sigma
    assert abs(len(a) - 600) < 5 * (2000 * 0.3 * 0.7) ** 0.5


def test_sample_thresholds_nest(spark):
    """sample(f1) is a SUBSET of sample(f2) for f1 < f2 under the same
    salt — growing a quota only adds documents, never swaps them."""
    df = _docs(spark)
    small = {r[0] for r in sampling.hash_sample(df, "doc_id", 0.1).collect()}
    big = {r[0] for r in sampling.hash_sample(df, "doc_id", 0.4).collect()}
    assert small and small < big
    # boundary fractions
    assert sampling.hash_sample(df, "doc_id", 0.0).count() == 0
    assert sampling.hash_sample(df, "doc_id", 1.0).count() == df.count()


def test_stratified_fractions_and_default(spark):
    df = _docs(spark)
    out = sampling.stratified_sample(
        df, "doc_id", "lang",
        {"en": 0.5, "de": 0.2, "zh": 0.0},
        default_fraction=0.1,
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("zh") is None  # 0.0 quota -> stratum dropped entirely
    assert abs(got["en"] - 250) < 5 * (500 * 0.25) ** 0.5
    assert abs(got["de"] - 100) < 5 * (500 * 0.16) ** 0.5
    assert abs(got.get("fr", 0) - 50) < 5 * (500 * 0.09) ** 0.5  # default
    # per-row decisions match the plain sampler at the stratum's fraction
    en_direct = {
        r[0]
        for r in sampling.hash_sample(
            df.filter(F.col("lang") == "en"), "doc_id", 0.5, salt="mix-v1"
        ).collect()
    }
    assert {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()} == en_direct


def test_split_disjoint_exhaustive_and_growth_stable(spark):
    df = _docs(spark, 1500)
    out = sampling.assign_split(
        df, "doc_id", {"train": 8, "val": 1, "test": 1}
    )
    n = out.count()
    assert n == 1500
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"train", "val", "test"}
    assert abs(by["train"] - 1200) < 5 * (1500 * 0.8 * 0.2) ** 0.5
    # leakage safety: the assignment of existing keys is unchanged when
    # the corpus grows
    grown = sampling.assign_split(
        _docs(spark, 3000), "doc_id", {"train": 8, "val": 1, "test": 1}
    )
    old = {r["doc_id"]: r["split"] for r in out.collect()}
    new = {r["doc_id"]: r["split"] for r in grown.filter(F.col("doc_id") < 1500).collect()}
    assert old == new


def test_sampling_plan_is_shuffle_free(spark):
    """The samplers must stay narrow: a filter/projection over built-in
    expressions — no Exchange, no Python UDF (BatchEvalPython)."""
    df = _docs(spark)
    for d in (
        sampling.hash_sample(df, "doc_id", 0.3),
        sampling.stratified_sample(df, "doc_id", "lang", {"en": 0.5}, 0.1),
        sampling.assign_split(df, "doc_id", {"a": 1, "b": 1}),
    ):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


def test_split_input_validation(spark):
    import pytest

    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        sampling.assign_split(df, "doc_id", {})
    with pytest.raises(ValueError):
        sampling.assign_split(df, "doc_id", {"a": 0.0})
    # single split: everything gets the one label
    one = sampling.assign_split(df, "doc_id", {"all": 3})
    assert {r["split"] for r in one.collect()} == {"all"}


def _skewed_docs(spark):
    """1600 en, 320 de, 64 fr, 16 zh — a skewed language histogram."""
    sizes = {"en": 1600, "de": 320, "fr": 64, "zh": 16}
    frames = []
    base = 0
    for lang, n in sizes.items():
        frames.append(
            spark.range(base, base + n).select(
                F.col("id").alias("doc_id"), F.lit(lang).alias("lang")
            )
        )
        base += n
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    return df, sizes


def test_temperature_fractions_flatten(spark):
    """alpha < 1 must keep a HIGHER fraction of small strata than large
    ones (the whole point of temperature mixing), and alpha = 1 must
    keep the same fraction everywhere (proportional = no flattening)."""
    counts = {"en": 1600, "de": 320, "fr": 64, "zh": 16}
    # target small enough that no stratum clips at keep-all
    f_half = sampling.temperature_fractions(counts, 0.5, target_fraction=0.05)
    assert f_half["zh"] > f_half["fr"] > f_half["de"] > f_half["en"]
    f_one = sampling.temperature_fractions(counts, 1.0, target_fraction=0.5)
    assert len({round(v, 6) for v in f_one.values()}) == 1


def test_temperature_fractions_target_and_clip(spark):
    counts = {"big": 10_000, "tiny": 10}
    # aggressive flattening wants more tiny rows than exist -> clip at 1.0
    f = sampling.temperature_fractions(counts, 0.2, target_rows=5_000)
    assert f["tiny"] == 1.0
    assert 0.0 < f["big"] < 1.0
    import pytest

    with pytest.raises(ValueError):
        sampling.temperature_fractions(counts, 0.5)
    with pytest.raises(ValueError):
        sampling.temperature_fractions(counts, 0.5, 0.5, 100)


def test_temperature_sample_realized_mix(spark):
    """The realized sample hits the per-stratum expectations (md5 is
    uniform; tolerance = 4 sigma of the binomial) and total ≈ target."""
    df, sizes = _skewed_docs(spark)
    out = sampling.temperature_sample(
        df, "doc_id", "lang", alpha=0.5, target_fraction=0.5
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fracs = sampling.temperature_fractions(sizes, 0.5, target_fraction=0.5)
    for lang, n in sizes.items():
        exp = fracs[lang] * n
        sd = (n * fracs[lang] * (1 - fracs[lang])) ** 0.5
        assert abs(got.get(lang, 0) - exp) <= 4 * sd + 1, (lang, got.get(lang), exp)


def test_temperature_sample_deterministic_across_layouts(spark):
    df, _ = _skewed_docs(spark)
    ids = lambda d: {r[0] for r in d.select("doc_id").collect()}  # noqa: E731
    a = ids(sampling.temperature_sample(df, "doc_id", "lang", 0.5, target_fraction=0.4))
    b = ids(
        sampling.temperature_sample(
            df.repartition(13, "doc_id"), "doc_id", "lang", 0.5, target_fraction=0.4
        )
    )
    assert a == b and a


def test_temperature_sample_null_stratum_participates(spark):
    """NULL strata are real strata: they enter the n_g^alpha histogram
    and keep ~their flattened share — not silently dropped (which would
    make the temperature path disagree with the quotas path)."""
    df = spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, None).otherwise(
            F.when(F.col("id") % 3 == 1, "en").otherwise("de")
        ).alias("lang"),
    )
    out = sampling.temperature_sample(
        df, "doc_id", "lang", alpha=0.5, target_fraction=0.5
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # equal-sized strata -> each keeps ~half; the NULL stratum included
    assert None in got
    for k in (None, "en", "de"):
        assert 140 <= got.get(k, 0) <= 260, got


# --- weighted_sample_topk (Efraimidis–Spirakis) -------------------------


def test_weighted_topk_deterministic_and_layout_free(spark):
    from csv_cruncher_spark.operators.sampling import weighted_sample_topk

    rows = [(f"k{i}", (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id STRING, w INT")
    a = sorted(r.id for r in weighted_sample_topk(df, "id", "w", 20).collect())
    b = sorted(
        r.id
        for r in weighted_sample_topk(df.repartition(9), "id", "w", 20).collect()
    )
    c = sorted(r.id for r in weighted_sample_topk(df, "id", "w", 20).collect())
    assert a == b == c
    assert len(a) == 20


def test_weighted_topk_weight_bias(spark):
    """Across many salts, a row with 20x the weight of its peers must be
    selected far more often — the E-S inclusion-probability contract."""
    from csv_cruncher_spark.operators.sampling import weighted_sample_topk

    rows = [("heavy", 200)] + [(f"light{i}", 10) for i in range(49)]
    df = spark.createDataFrame(rows, "id STRING, w INT").cache()
    heavy_in = light0_in = 0
    for s in range(12):
        got = {
            r.id
            for r in weighted_sample_topk(df, "id", "w", 10, salt=f"s{s}").collect()
        }
        heavy_in += "heavy" in got
        light0_in += "light0" in got
    assert heavy_in >= 10  # ~always sampled (weight share 200/690 vs k=10)
    assert light0_in <= heavy_in


def test_weighted_topk_excludes_nonpositive_and_null(spark):
    from csv_cruncher_spark.operators.sampling import weighted_sample_topk

    rows = [("a", 5), ("b", 0), ("c", -3), ("d", None), ("e", 2)]
    df = spark.createDataFrame(rows, "id STRING, w INT")
    got = {r.id for r in weighted_sample_topk(df, "id", "w", 10).collect()}
    assert got == {"a", "e"}


def test_weighted_topk_key_out_and_validation(spark):
    import pytest as _pytest

    from csv_cruncher_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame([("a", 1)], "id STRING, w INT")
    out = weighted_sample_topk(df, "id", "w", 1, key_out="es_key")
    row = out.collect()[0]
    assert row.es_key < 0  # ln(u)/w is always negative
    assert set(out.columns) == {"id", "w", "es_key"}
    with _pytest.raises(ValueError):
        weighted_sample_topk(df, "id", "w", 0)
