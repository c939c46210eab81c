"""Shannon character entropy (operators/textstats.py char_entropy).

Pins the quantized formula against a pure-Python replay on hand-built
and random strings, the NULL/empty row-survival contract, and the
known closed forms (uniform alphabet -> ln(k), single glyph -> 0).
"""

import math
import os
import sys
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.operators.textstats import char_entropy  # noqa: E402


def py_entropy_micro(text):
    if not text:
        return None
    counts = Counter(text)
    n = sum(counts.values())
    s = sum(int(round(c * math.log(c) * 1_000_000)) for c in counts.values())
    return int(round(math.log(n) * 1_000_000 - s / n))


def run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in char_entropy(df, "doc_id", "text").collect()}


def test_closed_forms_and_survival(spark):
    texts = [
        "aaaa",          # single glyph -> 0
        "abcd",          # uniform 4 -> ln(4)*1e6
        "",              # empty -> NULL entropy, row kept
        None,            # NULL  -> NULL entropy, row kept
        "aab",
    ]
    got = run(spark, texts)
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0].entropy_micro == 0
    assert got[0].n_distinct_chars == 1
    assert got[1].entropy_micro == int(round(math.log(4) * 1_000_000))
    assert got[2].entropy_micro is None and got[2].n_chars == 0
    assert got[3].entropy_micro is None and got[3].n_chars == 0
    assert got[4].entropy_micro == py_entropy_micro("aab")
    assert got[4].n_chars == 3 and got[4].n_distinct_chars == 2


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x024F),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_matches_python_replay_on_random_text(spark, texts):
    got = run(spark, texts)
    for i, t in enumerate(texts):
        expect = py_entropy_micro(t)
        assert got[i].entropy_micro == expect, (t, got[i])
        assert got[i].n_chars == len(t)
        assert got[i].n_distinct_chars == len(set(t))


def test_entropy_bounded_by_log_distinct(spark):
    texts = ["the quick brown fox jumps over the lazy dog"]
    got = run(spark, texts)[0]
    # H <= ln(k) with k distinct classes (plus 1 micro-nat of quantization)
    assert got.entropy_micro <= int(math.log(got.n_distinct_chars) * 1e6) + 1
    assert got.entropy_micro > 0
