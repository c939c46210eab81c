"""textstats.clean_text: NFC composition, control stripping, whitespace
collapse — against pure-Python unicodedata, with idempotence and null
handling."""

import re
import unicodedata

from pyspark.sql import Row

from csv_cruncher_spark.operators import textstats

CASES = [
    "café composed",          # decomposed -> cafés NFC
    "Å ring",                  # decomposed ring
    "bell\x07 and\x00nul",          # C0 controls stripped
    "  doubled\t\tspace\n\nlines ",  # whitespace collapse + trim
    "plain ascii stays put",
    "",
]


def _py_clean(x: str) -> str:
    x = unicodedata.normalize("NFC", x)
    x = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", x)
    return re.sub(r"[ \t\n\r]+", " ", x).strip()


def test_clean_text_matches_python(spark):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(CASES)])
    got = {r["i"]: r["text"]
           for r in textstats.clean_text(df, "text").collect()}
    for i, t in enumerate(CASES):
        assert got[i] == _py_clean(t), (i, repr(t))


def test_clean_text_idempotent_and_null(spark):
    df = spark.createDataFrame(
        [Row(i=0, text="café  x\x07"), Row(i=1, text=None)]
    )
    once = textstats.clean_text(df, "text")
    twice = textstats.clean_text(once, "text")
    a = {r["i"]: r["text"] for r in once.collect()}
    b = {r["i"]: r["text"] for r in twice.collect()}
    assert a == b
    assert a[1] is None
