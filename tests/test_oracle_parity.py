"""Local mirror of the driver's correctness gate: run every queries() entry
in Spark and its oracle_sql() twin in DuckDB on the same parquet tables,
compare row count + column names + order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize_pdf(pdf):
    """Driver-faithful normalization: go through pandas (like the driver's
    hash does), sort columns by name, keep dtype distinctions — an int64
    column and a float64 column holding the same numbers must MISMATCH
    (that is exactly the HUGEINT→float64 artifact that slipped past the
    fetchall()-based round-1 version of this test), and -0.0 stays
    distinct from 0.0."""
    pdf = pdf[sorted(pdf.columns)]
    kinds = tuple(pdf[c].dtype.kind for c in pdf.columns)
    out = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                # tolerate sub-1e-9 engine noise only; sign of zero survives
                v = "NaN" if math.isnan(v) else round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return kinds, sorted(out)


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()

    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column names differ: spark={list(spark_pdf.columns)} "
        f"duck={list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    (sk, ns), (dk, nd) = _normalize_pdf(spark_pdf), _normalize_pdf(duck_pdf)
    # dtype KINDS must agree column-by-column (int vs float is a driver
    # hash mismatch even when values print the same)
    norm = {"u": "i", "b": "i"}  # unsigned/bool fold into int kind
    assert [norm.get(k, k) for k in sk] == [norm.get(k, k) for k in dk], (
        f"{name}: dtype kinds differ on sorted columns "
        f"{sorted(spark_pdf.columns)}: spark={sk} duck={dk}"
    )
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:5]
    assert ns == nd, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={ns[i]} duck={nd[i]}" for i in mism
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
