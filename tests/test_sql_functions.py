"""SQL-callable function surface (functions/sql_registry.py).

Replays the reference's own test vectors VERBATIM through ``spark.sql``
— same function names, same argument order (path first), same flag
defaults — per it/SqlFunctionsTest.kt:22-58, and pins bit-parity
between the SQL sampling functions and the DataFrame API in
operators/sampling.py (same md5 math → same selected rows)."""

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.functions import json_leaf, register_sql_functions
from csv_cruncher_spark.operators.sampling import (
    assign_split,
    hash_bucket,
    hash_sample,
)


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_sql_functions(spark)


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS r").first()["r"]


def test_json_subtree_sql_reference_vectors(spark):
    """SqlFunctionsTest.kt:22-29 — jsonSubtree(path, jsonString)."""
    vec = [
        ("""jsonSubtree('foo', '{ "foo": "bar" }')""", '"bar"'),
        ("""jsonSubtree('foo', '{ "foo": { "bar": "baz" } }')""", '{"bar":"baz"}'),
        ("""jsonSubtree('foo/bar', '{ "foo": { "bar": "baz" } }')""", '"baz"'),
        ("""jsonSubtree('foo/bar', '{ "foo": { "bar": null } }')""", "null"),
        ("""jsonSubtree('foo/NON-EXISTENT', '{ "foo": { "bar": "baz" } }')""", None),
    ]
    for expr, want in vec:
        assert _one(spark, expr) == want, expr


def test_json_leaf_sql_reference_vectors(spark):
    """SqlFunctionsTest.kt:32-41 — jsonLeaf(path, jsonString[, flag]),
    flag defaults false like the Kotlin impl; JSON null → 'null' text."""
    vec = [
        ("""jsonLeaf('foo', '{ "foo": "bar" }')""", "bar"),
        ("""jsonLeaf('foo', '{ "foo": { "bar": "baz" } }', true)""", None),
        ("""jsonLeaf('foo/bar', '{ "foo": { "bar": "baz" } }')""", "baz"),
        ("""jsonLeaf('foo/bar', '{ "foo": { "bar": "" } }')""", ""),
        ("""jsonLeaf('foo/bar', '{ "foo": { "bar": null } }')""", "null"),
        ("""jsonLeaf('foo/NON-EXISTENT', '{ "foo": { "bar": "baz" } }')""", None),
    ]
    for expr, want in vec:
        assert _one(spark, expr) == want, expr
    with pytest.raises(Exception, match="not scalar"):
        spark.sql(
            """SELECT jsonLeaf('foo', '{ "foo": { "bar": "baz" } }', false)"""
        ).collect()


def test_json_leaves_sql_reference_vectors(spark):
    """SqlFunctionsTest.kt:44-57 — jsonLeaves(pathToArray, leavesSubPath,
    jsonString[, flag]); serialized-array STRING for byte parity."""
    vec = [
        ("""jsonLeaves('foo', '', '{ "foo": ["bar"] }')""", '["bar"]'),
        ("""jsonLeaves('foo', '', '{ "foo": { "bar": "baz" } }', true)""", None),
        ("""jsonLeaves('foo/bar', '', '{ "foo": { "bar": ["baz"] } }')""", '["baz"]'),
        ("""jsonLeaves('foo/bar', '', '{ "foo": { "bar": [""] } }')""", '[""]'),
        ("""jsonLeaves('foo/bar', '', '{ "foo": { "bar": [null] } }')""", "[null]"),
        # missing path → NULL even with flag=false (error is only for a
        # PRESENT non-array node)
        (
            """jsonLeaves('foo/NON-EXISTENT', '', '{ "foo": { "bar": "baz" } }', false)""",
            None,
        ),
        (
            """jsonLeaves('foo', '/prop1', '{ "foo": [{ "prop1": "val1" }, { "prop1": "val2" }] }', true)""",
            '["val1","val2"]',
        ),
    ]
    for expr, want in vec:
        assert _one(spark, expr) == want, expr
    with pytest.raises(Exception, match="not an array"):
        spark.sql(
            """SELECT jsonLeaves('foo', '', '{ "foo": { "bar": "baz" } }', false)"""
        ).collect()
    # the array<string> form
    assert _one(
        spark,
        """jsonLeavesArray('foo', '/p', '{ "foo": [{ "p": "a" }, { "p": null }] }')""",
    ) == ["a", None]


def test_starts_with_resolves_natively(spark):
    """SqlFunctions.kt:17-29 — startsWith needs no registration: Spark's
    case-insensitive resolution lands on the built-in with the identical
    null-on-null contract."""
    r = spark.sql(
        "SELECT startsWith('foobar', 'foo') AS a, "
        "startsWith('foobar', 'bar') AS b, "
        "startsWith(CAST(NULL AS STRING), 'x') AS n"
    ).first()
    assert r["a"] is True and r["b"] is False and r["n"] is None


def test_json_leaf_builder_null_text_parity(spark):
    """The Python builder matches the reference's JSON-null vector too
    (SqlFunctionsTest.kt:38): present null → 'null' text, missing →
    SQL NULL."""
    df = spark.createDataFrame(
        [('{"foo":{"bar":null}}',)], "j string"
    )
    r = df.select(
        json_leaf("j", "foo/bar").alias("present"),
        json_leaf("j", "foo/missing").alias("missing"),
    ).first()
    assert r["present"] == "null"
    assert r["missing"] is None


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )


def test_hash_keep_bit_parity_with_dataframe_api(spark, keys_df):
    """hashKeep(key, f, salt) selects EXACTLY hash_sample's rows — the
    SQL and DataFrame surfaces share one membership function."""
    keys_df.createOrReplaceTempView("k")
    got = {
        r["doc_id"]
        for r in spark.sql(
            "SELECT doc_id FROM k WHERE hashKeep(doc_id, 0.37d, 's1')"
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in hash_sample(keys_df, "doc_id", 0.37, salt="s1").collect()
    }
    assert got == want and 0 < len(got) < 2000
    # hashBucket is the same draw the samplers use
    r = spark.sql(
        "SELECT hashBucket(doc_id, 's1') AS b FROM k LIMIT 5"
    ).collect()
    want_b = (
        keys_df.select(hash_bucket(F.col("doc_id"), "s1").alias("b"))
        .limit(5)
        .collect()
    )
    assert [x["b"] for x in r] == [x["b"] for x in want_b]


def test_assign_split_bit_parity_with_dataframe_api(spark, keys_df):
    """assignSplit(key, t, v, salt) == assign_split with weights
    {train: t, val: v, test: 1-t-v} row-for-row."""
    keys_df.createOrReplaceTempView("k")
    got = {
        r["doc_id"]: r["s"]
        for r in spark.sql(
            "SELECT doc_id, assignSplit(doc_id, 0.8d, 0.1d, 'sp') AS s FROM k"
        ).collect()
    }
    want = {
        r["doc_id"]: r["split"]
        for r in assign_split(
            keys_df,
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
            salt="sp",
        ).collect()
    }
    assert got == want
    assert set(got.values()) == {"train", "val", "test"}


def test_sql_functions_stay_jvm_side(spark):
    """The registered bodies are inlined Catalyst expressions — the plan
    of a query using them must contain no Python evaluation node."""
    spark.range(0, 10).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    ).createOrReplaceTempView("t10")
    plan = spark.sql(
        "SELECT jsonLeaf('a', concat('{\"a\":', id, '}')) AS l, "
        "hashKeep(k, 0.5d, 's') AS m FROM t10 "
        "JOIN (SELECT id, concat('k', id) AS k FROM range(10)) USING (k)"
    )
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in explained
    assert "ArrowEvalPython" not in explained


def test_textstats_sql_twins_bit_parity(spark):
    """Every registered text-gate SQL function returns exactly what its
    DataFrame builder returns, row for row, over real document text —
    vocabularies are imported from textstats, so this pins that the SQL
    bodies' MATH matches too."""
    from csv_cruncher_spark.operators import textstats

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    docs.createOrReplaceTempView("docs_sqlfn")
    got = {
        r["doc_id"]: r
        for r in spark.sql(
            """SELECT doc_id,
                      tokenCount(text) AS n_tok,
                      regexTokenCount(text) AS n_rtok,
                      stopwordRatio(text) AS stop_r,
                      alphaRatio(text) AS alpha_r,
                      meanTokenLen(text) AS mean_len,
                      langId(text) AS lang_guess,
                      docFingerprint(text) AS fp
               FROM docs_sqlfn"""
        ).collect()
    }
    qdf = textstats.quality_metrics(docs, "text")
    qdf = textstats.lang_id(qdf, "text")
    want_rows = qdf.select(
        "doc_id",
        F.col("n_tokens").alias("n_tok"),
        textstats.regex_token_count("text").alias("n_rtok"),
        F.col("stopword_ratio").alias("stop_r"),
        F.col("alpha_ratio").alias("alpha_r"),
        F.col("mean_token_len").alias("mean_len"),
        "lang_guess",
        textstats.normalized_fingerprint("text").alias("fp"),
    ).collect()
    assert len(want_rows) == 200
    for w in want_rows:
        g = got[w["doc_id"]]
        for f in ("n_tok", "n_rtok", "stop_r", "alpha_r", "mean_len",
                  "lang_guess", "fp"):
            assert g[f] == w[f], (w["doc_id"], f, g[f], w[f])


def test_sql_text_gate_end_to_end(spark):
    """The admission-gate shape a -sql user writes: filter + derive in
    one SQL string using only registered functions."""
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        300
    ).createOrReplaceTempView("docs_gate")
    out = spark.sql(
        """SELECT doc_id, langId(text) AS lang_guess,
                  docFingerprint(text) AS fp
           FROM docs_gate
           WHERE tokenCount(text) >= 5 AND alphaRatio(text) > 0.3
             AND hashKeep(CAST(doc_id AS STRING), 0.9d, 'gate')"""
    )
    rows = out.collect()
    assert 0 < len(rows) <= 300
    assert all(len(r["fp"]) == 32 for r in rows)
    explained = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in explained
    assert "ArrowEvalPython" not in explained


def test_crunch_sql_surface_accepts_reference_function_calls(spark, tmp_path):
    """End-to-end through the user surface: a -sql string calling
    jsonLeaf/jsonSubtree (reference argument order) over an imported
    CSV works without any DataFrame-API involvement."""
    from csv_cruncher_spark.crunch import Cruncher, ExportSpec, ImportSpec, Options

    src = tmp_path / "in.csv"
    # single-quote quoting: the import default mirrors the reference's
    # HSQLDB text-table binding qc=' (HsqlDbTableCreator.kt:167)
    src.write_text(
        "id,js\n"
        "1,'{\"name\": \"alpha\", \"meta\": {\"lang\": \"en\"}}'\n"
        "2,'{\"name\": \"beta\", \"meta\": {\"lang\": \"cs\"}}'\n"
    )
    out = tmp_path / "out.csv"
    Cruncher(
        Options(
            imports=[ImportSpec(path=str(src))],
            exports=[ExportSpec(path=str(out), format="csv")],
            sql=(
                "SELECT id, jsonLeaf('name', js) AS name, "
                "jsonLeaf('meta/lang', js) AS lang, "
                "jsonSubtree('meta', js) AS meta "
                "FROM $table ORDER BY id"
            ),
        )
    ).run(spark)
    text = out.read_text().strip().splitlines()
    assert text[0] == "id,name,lang,meta"
    assert text[1].startswith("1,alpha,en,")
    assert '{"lang":"en"}' in text[1].replace('\\"', '"')
