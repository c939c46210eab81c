"""Hypothesis property suites for the corpus-stage operators: the Spark
implementation must agree with an independent pure-Python twin on
arbitrary inputs — percentile_filter's kept set, temperature_fractions'
invariants, and epoch_shuffle's permutation/stability contracts."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_cruncher_spark.operators import ranking, sampling, shuffle

scores = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 50),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=60, unique_by=lambda t: t[0],
)


def _py_percentile(vals: list[int], p: float) -> float:
    """Twin of Spark percentile / DuckDB quantile_cont (linear
    interpolation on (n-1)p)."""
    v = sorted(vals)
    if len(v) == 1:
        return float(v[0])
    idx = p * (len(v) - 1)
    lo = math.floor(idx)
    hi = math.ceil(idx)
    frac = idx - lo
    return v[lo] + frac * (v[hi] - v[lo])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=scores, keep=st.sampled_from([0.25, 0.5, 0.75, 1.0]))
def test_percentile_filter_matches_python(spark, rows, keep):
    df = spark.createDataFrame(rows, "doc_id int, score int, lang string")
    got = {
        r["doc_id"]
        for r in ranking.percentile_filter(
            df, "score", keep, stratum_col="lang"
        ).collect()
    }
    expect = set()
    by_lang: dict[str, list] = {}
    for i, sc, lang in rows:
        by_lang.setdefault(lang, []).append((i, sc))
    for lang, pairs in by_lang.items():
        thr = _py_percentile([sc for _, sc in pairs], 1.0 - keep)
        expect |= {i for i, sc in pairs if sc >= thr}
    assert got == expect


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.dictionaries(
        st.sampled_from(["en", "de", "fr", "zh", "es"]),
        st.integers(1, 100_000), min_size=1, max_size=5,
    ),
    alpha=st.sampled_from([0.2, 0.5, 0.7, 1.0]),
    tf=st.sampled_from([0.1, 0.5, 0.9]),
)
def test_temperature_fraction_invariants(counts, alpha, tf):
    f = sampling.temperature_fractions(counts, alpha, target_fraction=tf)
    assert set(f) == set(counts)
    assert all(0.0 <= v <= 1.0 for v in f.values())
    # expected kept rows never exceed (clipping only reduces) and are
    # within rounding of the target when nothing clips
    expected = sum(f[s] * counts[s] for s in counts)
    target = tf * sum(counts.values())
    assert expected <= target + 1e-3 * target + 1
    if all(v < 1.0 for v in f.values()):
        assert abs(expected - target) <= 0.01 * target + 1
    # alpha < 1 never gives a LARGER keep fraction to a LARGER stratum
    items = sorted(counts.items(), key=lambda kv: kv[1])
    if alpha < 1.0:
        for (s1, n1), (s2, n2) in zip(items, items[1:]):
            if n1 < n2:
                assert f[s1] >= f[s2] - 1e-9


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=80, unique=True),
    epoch=st.integers(1, 5),
)
def test_epoch_shuffle_matches_python_twin(spark, ids, epoch):
    """Global positions equal an independent pure-Python derivation of
    the same draw/shard/offset math — total order, no Spark specifics."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["global_pos"]
        for r in shuffle.epoch_shuffle(df, "doc_id", epoch, n_shards=8).collect()
    }

    def draw(i: int) -> str:
        return hashlib.md5(f"{i}:shuffle-v1:e{epoch}".encode()).hexdigest()[:8]

    def shard(i: int) -> int:
        return int(draw(i)[:4], 16) % 8

    order = sorted(ids, key=lambda i: (shard(i), draw(i), i))
    expect = {i: pos for pos, i in enumerate(order)}
    assert got == expect
