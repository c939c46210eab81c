"""SQL-callable registration of the function surface.

The reference registers its scalar functions INTO the SQL engine, so
users call them inside the ``-sql`` query string
(/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/util/
SqlFunctions.kt:17-89, ``CREATE FUNCTION`` against HSQLDB). The Python
Column builders in :mod:`.json_funcs` / :mod:`..operators.sampling`
cover the DataFrame API, but a reference user's SQL — e.g.
``SELECT jsonLeaf('name', json, true) FROM t`` — needs the names
resolvable by the SQL parser. This module registers them as Spark SQL
scalar UDFs (``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN expr``):
the bodies are pure Catalyst expressions inlined at plan time, so the
hot path stays JVM-side / whole-stage-codegen — no Python UDF anywhere.

Argument order parity matters: the reference's SQL signatures take the
PATH FIRST and the JSON string second —
``jsonSubtree(path, jsonString)`` (SqlFunctions.kt:34),
``jsonLeaf(path, jsonString, nullOnNonScalarResult)`` (:49),
``jsonLeaves(pathToArray, leavesSubPath, jsonString, nullOnNonArrayNode)``
(:80) — the REVERSE of the Python builders' (json, path). The flag
parameters default like the Kotlin impls (``false`` = error on
non-scalar/non-array), so both 2-arg and 3-arg reference call sites
parse. ``startsWith(whole, startx)`` (SqlFunctions.kt:20) needs no
registration: Spark resolves function names case-insensitively, so it
lands on the built-in ``startswith`` with the identical contract —
asserted by the test suite rather than shadowed here.

``jsonLeaves`` returns the JSON-serialized array STRING for byte parity
(HSQLDB functions cannot return ARRAY, SqlFunctions.kt:81's dead-code
comment); ``jsonLeavesArray`` is the strictly-more-powerful
``array<string>`` form matching the Python builder.

Beyond the reference, the deterministic-sampling primitives are exposed
with the same md5 math as :mod:`..operators.sampling` — SQL and
DataFrame callers select bit-identical row sets:

- ``hashBucket(key, salt)`` — the 8-lowercase-hex uniform draw
  (compares like the uint32 it encodes).
- ``hashKeep(key, fraction, salt)`` — deterministic membership at
  ``fraction`` (layout/partitioning independent, unlike TABLESAMPLE).
- ``assignSplit(key, trainFrac, valFrac, salt)`` — leakage-safe
  train/val/test labels; fractions are absolute (test gets the rest).

And the text-analysis gates (``tokenCount``, ``regexTokenCount``,
``stopwordRatio``, ``alphaRatio``, ``meanTokenLen``, ``langId``,
``docFingerprint``) as SQL twins of :mod:`..operators.textstats`, so the
whole training-data admission gate runs from one ``-sql`` string.

Registration is session-scoped and idempotent (CREATE OR REPLACE);
:meth:`~csv_cruncher_spark.crunch.Cruncher.run` calls it before init-SQL
scripts run, so scripts and user queries both see the functions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# '$' + '.seg' per non-empty slash segment: 'foo/bar' -> '$.foo.bar',
# '' -> '$' (identity), leading/trailing slashes ignored — the SQL twin
# of json_funcs.slash_path_to_jsonpath.
_JP = (
    "concat('$', array_join(transform(filter(split({p}, '/'),"
    " x -> x != ''), s -> concat('.', s)), ''))"
)

# variant at the slash path (SQL NULL when the path is missing)
_NODE = "try_variant_get(parse_json({js}), " + _JP + ", 'variant')"

# raw scalar text: JSON null -> 4-char 'null' (present), missing -> SQL
# NULL — mirrors json_funcs.json_leaf including the is_variant_null(NULL)
# fall-through.
_SCALAR_TEXT = (
    "CASE WHEN is_variant_null({v}) THEN 'null' "
    "ELSE try_variant_get({v}, '$', 'string') END"
)

_IS_NONSCALAR = (
    "(startswith(schema_of_variant({v}), 'OBJECT')"
    " OR startswith(schema_of_variant({v}), 'ARRAY'))"
)

# keep-threshold for an f-fraction of the 8-hex draw; 'g' sorts after
# every hex string (keep all), '' before (keep none). cast-to-bigint
# truncates exactly like Python's int(), so thresholds match
# operators.sampling._hex_threshold bit-for-bit.
_THR = (
    "CASE WHEN {f} >= 1.0d THEN 'g' WHEN {f} <= 0.0d THEN '' "
    "ELSE format_string('%08x', cast({f} * 4294967296d AS BIGINT)) END"
)


def _text_statements() -> list[str]:
    """SQL twins of the text-analysis gates (operators/textstats.py) so
    a ``-sql`` user can run the full training-data admission gate in
    plain SQL (``WHERE tokenCount(text) >= 50 AND langId(text) = 'en'``).
    Marker/stopword vocabularies and the token regex are imported from
    textstats — one source of truth; bit-parity with the DataFrame
    builders is pinned by test_sql_functions."""
    from ..operators.textstats import LANG_MARKERS, STOPWORDS, TOKEN_REGEX

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    scores = {
        lang: (
            "size(filter(split(lower(text), ' '), x -> x IN ("
            + ", ".join(f"'{w}'" for w in markers)
            + ")))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    # strict-argmax, first-listed language wins ties (textstats.lang_id):
    # the winner is the FIRST language whose score equals the max; all
    # scores are >= 0, so max <= 0 means no votes at all -> 'und'
    m = "greatest(" + ", ".join(scores.values()) + ")"
    langs = list(LANG_MARKERS)
    arms = " ".join(
        f"WHEN {scores[lang]} = {m} THEN '{lang}'" for lang in langs[:-1]
    )
    lang_case = f"CASE WHEN {m} <= 0 THEN 'und' {arms} ELSE '{langs[-1]}' END"
    return [
        """CREATE OR REPLACE TEMPORARY FUNCTION tokenCount(text STRING)
            RETURNS INT RETURN size(split(text, ' '))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION regexTokenCount(
              text STRING, pattern STRING DEFAULT '{TOKEN_REGEX}')
            RETURNS INT RETURN regexp_count(lower(text), pattern)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION stopwordRatio(text STRING)
            RETURNS DOUBLE
            RETURN size(filter(split(text, ' '), x -> x IN ({stops})))
                   / size(split(text, ' '))""",
        """CREATE OR REPLACE TEMPORARY FUNCTION alphaRatio(text STRING)
            RETURNS DOUBLE
            RETURN length(regexp_replace(text, '[^a-zA-Z]', ''))
                   / length(text)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION meanTokenLen(text STRING)
            RETURNS DOUBLE
            RETURN (length(text) - (size(split(text, ' ')) - 1))
                   / size(split(text, ' '))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION langId(text STRING)
            RETURNS STRING RETURN {lang_case}""",
        """CREATE OR REPLACE TEMPORARY FUNCTION docFingerprint(text STRING)
            RETURNS STRING
            RETURN md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', ''), ' +', ' ')))""",
    ]


def _statements() -> list[str]:
    node = _NODE.format(js="jsonString", p="path")
    arr_node = _NODE.format(js="jsonString", p="pathToArray")
    leaves = (
        "transform(try_variant_get({n}, '$', 'array<variant>'), "
        "e -> try_variant_get(e, " + _JP.format(p="leavesSubPath") + ", 'string'))"
    ).format(n=arr_node)
    nonarray_guard = (
        "CASE WHEN {n} IS NOT NULL AND try_variant_get({n}, '$', "
        "'array<variant>') IS NULL AND NOT nullOnNonArrayNode THEN "
        "raise_error(format_string('Node at path %s is not an array', "
        "pathToArray)) ".format(n=arr_node)
    )
    return [
        # -- reference §2.B, SQL argument order (SqlFunctions.kt:17-89) --
        f"""CREATE OR REPLACE TEMPORARY FUNCTION jsonSubtree(
              path STRING, jsonString STRING) RETURNS STRING
            RETURN to_json({node})""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION jsonLeaf(
              path STRING, jsonString STRING,
              nullOnNonScalarResult BOOLEAN DEFAULT false) RETURNS STRING
            RETURN CASE
              WHEN {node} IS NULL OR NOT {_IS_NONSCALAR.format(v=node)}
                THEN {_SCALAR_TEXT.format(v=node)}
              WHEN nullOnNonScalarResult THEN NULL
              ELSE raise_error(format_string(
                'Node at path %s is not scalar', path))
            END""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION jsonLeaves(
              pathToArray STRING, leavesSubPath STRING, jsonString STRING,
              nullOnNonArrayNode BOOLEAN DEFAULT false) RETURNS STRING
            RETURN {nonarray_guard} ELSE to_json({leaves}) END""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION jsonLeavesArray(
              pathToArray STRING, leavesSubPath STRING, jsonString STRING,
              nullOnNonArrayNode BOOLEAN DEFAULT false)
            RETURNS ARRAY<STRING>
            RETURN {nonarray_guard} ELSE {leaves} END""",
        # -- deterministic sampling (operators.sampling twins) -----------
        """CREATE OR REPLACE TEMPORARY FUNCTION hashBucket(
              key STRING, salt STRING) RETURNS STRING
            RETURN substring(md5(concat_ws(':', key, salt)), 1, 8)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hashKeep(
              key STRING, fraction DOUBLE,
              salt STRING DEFAULT 'sample-v1') RETURNS BOOLEAN
            RETURN hashBucket(key, salt) < {_THR.format(f="fraction")}""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION assignSplit(
              key STRING, trainFrac DOUBLE, valFrac DOUBLE,
              salt STRING DEFAULT 'split-v1') RETURNS STRING
            RETURN CASE
              WHEN hashBucket(key, salt) < {_THR.format(f="trainFrac")}
                THEN 'train'
              WHEN hashBucket(key, salt) <
                   {_THR.format(f="(trainFrac + valFrac)")} THEN 'val'
              ELSE 'test'
            END""",
    ]


def register_sql_functions(spark: SparkSession) -> None:
    """Register the SQL-callable function surface on this session.
    Idempotent; temporary (session-scoped, like the reference's
    in-memory HSQLDB catalog)."""
    for stmt in _statements() + _text_statements():
        spark.sql(stmt)
