"""Unit tests for the scalar-function surface and the type-inference
ladder (reference parity: it/SqlFunctionsTest.kt:21-58,
util/SqlTypeReducer.kt:16-106, it/BooleanColumnDetectionTest.kt:42-71)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.functions import (
    infer_and_cast,
    infer_column_types,
    json_leaf,
    json_leaves,
    json_subtree,
)
from csv_cruncher_spark.functions.json_funcs import json_leaves_text

DOC = (
    '{"foo":{"bar":"baz","num":42,"nul":null,'
    '"arr":[{"name":"a"},{"name":"b"},{"name":null}]},"top":true}'
)


@pytest.fixture(scope="module")
def jdf(spark):
    return spark.createDataFrame([(DOC,)], ["j"])


# ------------------------------------------------------------- jsonSubtree


def test_json_subtree_string_keeps_quotes(jdf):
    """SqlFunctionsTest.kt:22-30: subtree of a string scalar keeps JSON
    quotes."""
    row = jdf.select(json_subtree("j", "foo/bar").alias("x")).first()
    assert row["x"] == '"baz"'


def test_json_subtree_object_and_null(jdf):
    rows = jdf.select(
        json_subtree("j", "foo/nul").alias("nul"),
        json_subtree("j", "foo/missing").alias("miss"),
        json_subtree("j", "foo/num").alias("num"),
    ).first()
    assert rows["nul"] == "null"  # JSON null → 'null' text
    assert rows["miss"] is None  # missing path → SQL NULL
    assert rows["num"] == "42"


# ----------------------------------------------------------------- jsonLeaf


def test_json_leaf_raw_text(jdf):
    """SqlFunctionsTest.kt:33-42: raw scalar text, unquoted."""
    rows = jdf.select(
        json_leaf("j", "foo/bar").alias("s"),
        json_leaf("j", "foo/num").alias("n"),
        json_leaf("j", "top").alias("b"),
        json_leaf("j", "foo").alias("nonscalar"),
        json_leaf("j", "foo/missing").alias("miss"),
    ).first()
    assert rows["s"] == "baz"
    assert rows["n"] == "42"
    assert rows["b"] == "true"
    assert rows["nonscalar"] is None  # null_on_nonscalar default
    assert rows["miss"] is None


def test_json_leaf_error_on_nonscalar(jdf):
    with pytest.raises(Exception, match="not scalar"):
        jdf.select(json_leaf("j", "foo", null_on_nonscalar=False)).collect()


# --------------------------------------------------------------- jsonLeaves


def test_json_leaves_array(jdf):
    """SqlFunctionsTest.kt:45-58: extract one leaf per array element; we
    return a real array plus the reference's serialized form."""
    rows = jdf.select(
        json_leaves("j", "foo/arr", "name").alias("arr"),
        json_leaves_text("j", "foo/arr", "name").alias("txt"),
        json_leaves("j", "foo/bar", "name").alias("nonarr"),
    ).first()
    assert rows["arr"] == ["a", "b", None]
    assert rows["txt"] == '["a","b",null]'
    assert rows["nonarr"] is None


def test_json_leaves_error_on_nonarray(jdf):
    with pytest.raises(Exception, match="not an array"):
        jdf.select(json_leaves("j", "foo/bar", "name", null_on_nonarray=False)).collect()


# ------------------------------------------------------------ type ladder


def test_infer_ladder_boolean_gate(spark):
    """B4 boolTable parity: true/false → BOOLEAN; yes/no, y/n stay string;
    0/1 → SMALLINT (last fitting candidate wins)."""
    df = spark.createDataFrame(
        [("TRUE", "true", "yes", "y", "1"), ("FALSE", "false", "no", "n", "0")],
        ["bu", "bl", "yn", "y1", "b01"],
    )
    t = infer_column_types(df)
    assert t["bu"] == "BOOLEAN"
    assert t["bl"] == "BOOLEAN"
    assert t["yn"] is None
    assert t["y1"] is None
    assert t["b01"] == "SMALLINT"


def test_infer_numeric_widths_and_timestamp(spark):
    df = spark.createDataFrame(
        [
            ("2018-10-08 01:02:03", "123456789012", "1234567", "12", "0.25", "123.456"),
            ("2019-01-01 00:00:00", "223456789012", "7654321", "34", "0.75", "654.321"),
        ],
        ["ts", "big", "i", "small", "d22", "d103"],
    )
    t = infer_column_types(df)
    assert t["ts"] == "TIMESTAMP"
    assert t["big"] == "BIGINT"
    assert t["i"] == "INTEGER"
    assert t["small"] == "SMALLINT"
    assert t["d22"] == "DECIMAL(2,2)"
    assert t["d103"] == "DECIMAL(10,3)"


def test_infer_uuid_stays_string(spark):
    df = spark.createDataFrame(
        [("9f35fe0a-1111-2222-3333-444455556666",), ("00000000-0000-0000-0000-000000000000",)],
        ["u"],
    )
    t = infer_column_types(df)
    assert t["u"] == "UUID"
    out = infer_and_cast(df)
    assert dict(out.dtypes)["u"] == "string"  # logical uuid, physical string


def test_infer_mixed_stays_string_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("1",), ("x",), (None,)], "v: string"
    )
    assert infer_column_types(df)["v"] is None
    df2 = spark.createDataFrame([("5",), (None,)], "v: string")
    assert infer_column_types(df2)["v"] == "SMALLINT"  # nulls don't disqualify
    df3 = spark.createDataFrame([(None,), (None,)], "v: string")
    assert infer_column_types(df3)["v"] is None  # all-null stays string


def test_infer_and_cast_applies(spark):
    df = spark.createDataFrame([("1", "2018-10-08 00:00:00")], ["n", "ts"])
    out = infer_and_cast(df)
    types = dict(out.dtypes)
    assert types["n"] == "smallint"
    assert types["ts"] == "timestamp"
    assert out.first()["n"] == 1
