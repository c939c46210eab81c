"""BPE training (operators/bpe.py): exact agreement with the classic
Sennrich reference algorithm (same tie-break), the canonical-string
replace semantics on adversarial repeats, early stop, and validation."""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from csv_cruncher_spark.operators import bpe


def _ref_bpe(texts, n):
    """Classic list-fold BPE (Sennrich et al. 2016) with the operator's
    tie-break: (count DESC, left ASC, right ASC)."""
    words = collections.Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower())
    )
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n + 1):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, cnt))
        new = {}
        for syms, f in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference_algorithm(spark):
    texts = [
        "low lower lowest low low newer newest new",
        "wider wide widest new newer low",
    ]
    out = bpe.bpe_train(_docs(spark, texts), "text", n_merges=8)
    assert [tuple(r) for r in out.orderBy("merge_rank").collect()] == _ref_bpe(
        texts, 8
    )


def test_bpe_repeated_symbol_left_to_right(spark):
    # 'aaaa': merging (a, a) must pair left-to-right non-overlapping
    # -> 'aa aa', NOT 'a aa a'; then (aa, aa) -> 'aaaa'
    texts = ["aaaa aaaa aaaa"]
    out = [tuple(r) for r in bpe.bpe_train(
        _docs(spark, texts), "text", n_merges=3
    ).orderBy("merge_rank").collect()]
    assert out == _ref_bpe(texts, 3)
    # round 1: the COUNT is over all adjacent occurrences (3 per word
    # x 3 words), while the APPLY is left-to-right non-overlapping
    # ('aa aa', never 'a aa a')
    assert out[0][1:] == ("a", "a", "aa", 9)
    # round 2: (aa,aa) and (aa,</w>) tie at 3; ASCII '<' < 'a' picks
    # (aa, </w>) — the tie-break both engines implement
    assert out[1][1:4] == ("aa", "</w>", "aa</w>")


def test_bpe_early_stop_when_fully_merged(spark):
    # one two-char word merges to a single symbol in 2 rounds; asking
    # for 10 returns only the learnable merges
    out = bpe.bpe_train(_docs(spark, ["ab ab"]), "text", n_merges=10)
    rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
    assert rows == _ref_bpe(["ab ab"], 10)
    assert len(rows) == 2


def test_bpe_validation(spark):
    with pytest.raises(ValueError):
        bpe.bpe_train(_docs(spark, ["x"]), "text", n_merges=0)


def _ref_encode(texts, merges):
    out = []
    for t in texts:
        toks = []
        for w in re.findall("[a-z0-9]+", (t or "").lower()):
            syms = list(w) + ["</w>"]
            for l, r in merges:
                new, pend = [], None
                for x in syms:
                    if pend is None:
                        pend = x
                    elif pend == l and x == r:
                        new.append(l + r)
                        pend = None
                    else:
                        new.append(pend)
                        pend = x
                if pend is not None:
                    new.append(pend)
                syms = new
            toks.extend(syms)
        out.append(toks)
    return out


def test_bpe_encode_matches_reference(spark):
    texts = [
        "low lower lowest low low newer newest new",
        "wider wide widest new newer low",
        "newest lowest widest",
    ]
    merges_df = bpe.bpe_train(_docs(spark, texts), "text", n_merges=6)
    pairs = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("merge_rank").collect()]
    out = bpe.bpe_encode(_docs(spark, texts), "doc_id", "text", merges_df)
    got = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"]) for r in out.collect()}
    ref = _ref_encode(texts, pairs)
    for i, toks in enumerate(ref):
        assert got[i] == (toks, len(toks)), i


def test_bpe_encode_null_text_survives(spark):
    df = spark.createDataFrame([(1, None), (2, "ab")], "doc_id long, text string")
    out = bpe.bpe_encode(df, "doc_id", "text", [("a", "b")])
    got = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"]) for r in out.collect()}
    assert got[1] == ([], 0)
    assert got[2] == (["ab", "</w>"], 2)


def test_bpe_encode_plan_is_pure_projection(spark):
    df = _docs(spark, ["a b"])
    out = bpe.bpe_encode(df, "doc_id", "text", [("a", "</w>")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan, plan


def test_bpe_encode_validation(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        bpe.bpe_encode(df, "doc_id", "text", [("a b", "c")])
    with pytest.raises(ValueError):
        bpe.bpe_encode(df, "doc_id", "text", [("", "c")])


def test_bpe_quote_bearing_tokens_are_safe(spark):
    # review finding: merge tokens and token_pattern are spliced into a
    # generated SQL expression — quotes/backslashes must be escaped, not
    # trusted ("don't"-style apostrophe tokens are routine with a
    # pattern that admits ')
    texts = ["don't don't won't don't", "won't can't don't"]
    docs = _docs(spark, texts)
    pat = "[a-z']+"
    merges_df = bpe.bpe_train(docs, "text", n_merges=4, token_pattern=pat)
    pairs = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("merge_rank").collect()]
    assert any("'" in l or "'" in r for l, r in pairs)
    out = bpe.bpe_encode(docs, "doc_id", "text", merges_df, token_pattern=pat)
    got = {r["doc_id"]: list(r["bpe_tokens"]) for r in out.collect()}

    # reference encode with the same pattern
    def ref(t):
        toks = []
        for w in re.findall(pat, t.lower()):
            syms = list(w) + ["</w>"]
            for l, r in pairs:
                new, pend = [], None
                for x in syms:
                    if pend is None:
                        pend = x
                    elif pend == l and x == r:
                        new.append(l + r)
                        pend = None
                    else:
                        new.append(pend)
                        pend = x
                if pend is not None:
                    new.append(pend)
                syms = new
            toks.extend(syms)
        return toks

    for i, t in enumerate(texts):
        assert got[i] == ref(t), i
