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


def test_unigram_logprob_semantics(spark):
    """Pure-Python twin on a tiny corpus: common-token docs score higher
    than rare/OOV-heavy docs; fixed-point math matches exactly."""
    import math

    from pyspark.sql import Row

    docs = [
        (1, "common common common words"),
        (2, "common words"),
        (3, "zzz qqq vvv"),  # all outside top_k -> pure OOV
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    out = {r["doc_id"]: r for r in
           textstats.unigram_logprob(df, "doc_id", "text", top_k=2).collect()}
    # vocab = top-2 by tf: common(4), words(2); total = 6
    total = 6
    micro = {
        "common": round(math.log(4 / total) * 1e6),
        "words": round(math.log(2 / total) * 1e6),
    }
    oov = round(math.log(0.5 / total) * 1e6)

    def score(text):
        toks = text.split()
        ms = [micro.get(t, oov) for t in toks]
        return sum(ms) / len(ms) / 1e6

    for i, t in docs:
        assert out[i]["avg_logprob"] == score(t), i
    assert out[3]["n_oov"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] > out[3]["avg_logprob"]


def test_unigram_logprob_external_vocab_and_layout(spark):
    from pyspark.sql import Row

    ref = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma alpha") for i in range(5)]
    )
    vocab = textstats.token_frequencies(ref, "doc_id", "text")
    batch = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta unseen")]
    )
    a = textstats.unigram_logprob(batch, "doc_id", "text", vocab=vocab).collect()[0]
    b = textstats.unigram_logprob(
        batch.repartition(7), "doc_id", "text", vocab=vocab.coalesce(1)
    ).collect()[0]
    assert a["avg_logprob"] == b["avg_logprob"]
    assert a["n_oov"] == 1


def test_unigram_logprob_default_vocab_is_bounded(spark):
    """Round-4 verdict nit: the default must BOUND the broadcast
    vocabulary (top_k=2^20), with unbounded exact mode opt-in via
    top_k=None. Both agree when the corpus vocab fits the bound; a tiny
    explicit bound visibly drops tail tokens to OOV."""
    import inspect

    from pyspark.sql import Row

    sig = inspect.signature(textstats.unigram_logprob)
    assert sig.parameters["top_k"].default == 1 << 20

    df = spark.createDataFrame(
        [Row(doc_id=1, text="aa aa aa bb bb cc"), Row(doc_id=2, text="cc dd")]
    )
    default = {r["doc_id"]: r for r in
               textstats.unigram_logprob(df, "doc_id", "text").collect()}
    exact = {r["doc_id"]: r for r in
             textstats.unigram_logprob(df, "doc_id", "text", top_k=None).collect()}
    for i in (1, 2):
        assert default[i]["avg_logprob"] == exact[i]["avg_logprob"]
        assert default[i]["n_oov"] == 0 == exact[i]["n_oov"]
    tiny = {r["doc_id"]: r for r in
            textstats.unigram_logprob(df, "doc_id", "text", top_k=1).collect()}
    assert tiny[2]["n_oov"] == 2  # cc and dd both fall outside top-1


def test_bigram_logprob_semantics(spark):
    """Pure-Python stupid-backoff twin on a tiny corpus: in-model
    bigrams use the conditional, unseen bigrams back off to 0.4x the
    unigram, OOV w2 takes the half-occurrence penalty; fixed-point math
    matches exactly and short docs get NULL scores."""
    import math

    from pyspark.sql import Row

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "qq zz"),  # unseen bigram; w2 'zz' is OOV (qq makes top-5 on ties)
        (4, "single"),          # < 2 tokens -> no bigrams
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    out = {r["doc_id"]: r for r in
           textstats.bigram_logprob(df, "doc_id", "text",
                                    top_k_bigrams=4, top_k_unigrams=5).collect()}

    # python twin ------------------------------------------------------
    toks = {i: t.split() for i, t in docs}
    bigs = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    from collections import Counter
    bic = Counter(b for bs in bigs.values() for b in bs)
    ctx = Counter()
    for (w1, _), c in bic.items():
        ctx[w1] += c
    top_bi = sorted(bic.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    mbi = {b: round(math.log(c / ctx[b[0]]) * 1e6) for b, c in top_bi}
    unic = Counter(t for ts in toks.values() for t in ts)
    top_uni = sorted(unic.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    total = sum(c for _, c in top_uni)
    muni = {w: round(math.log(0.4 * c / total) * 1e6) for w, c in top_uni}
    oov = round(math.log(0.4 * 0.5 / total) * 1e6)

    for i, _ in docs:
        bs = bigs[i]
        row = out[i]
        assert row["n_bigrams"] == len(bs), i
        if not bs:
            assert row["avg_logscore"] is None
            continue
        ms = [mbi.get(b, muni.get(b[1], oov)) for b in bs]
        assert row["avg_logscore"] == sum(ms) / len(ms) / 1e6, i
        assert row["n_backoff"] == sum(
            1 for b in bs if b not in mbi and b[1] in muni
        ), i
        assert row["n_oov"] == sum(
            1 for b in bs if b not in mbi and b[1] not in muni
        ), i
    # fluency signal: in-model doc ranks above the OOV word-salad doc
    assert out[1]["avg_logscore"] > out[3]["avg_logscore"]


def test_duplicate_spans_twin(spark):
    """Pure-Python twin: exact window positions and sharing counts;
    in-doc-only repeats are NOT flagged (distinct docs >= 2); short docs
    produce nothing."""
    from pyspark.sql import Row

    shared = "alpha beta gamma delta"          # 4 tokens, k=3 -> 2 windows
    docs = [
        (1, f"one two {shared} end1"),
        (2, f"{shared} other tail here"),
        (3, "three four five " + "loop loop loop loop loop loop"),  # in-doc only
        (4, "tiny doc"),                        # < k tokens
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    out = textstats.duplicate_spans(df, "doc_id", "text", span_tokens=3)
    got = {(r["doc_id"], r["pos"]): r["span_docs"] for r in out.collect()}

    # python twin
    from collections import defaultdict
    windows = defaultdict(set)
    pos_of = {}
    for i, t in docs:
        toks = t.lower().split()
        for p in range(len(toks) - 2):
            w = " ".join(toks[p:p + 3])
            windows[w].add(i)
            pos_of[(i, p + 1)] = w
    expect = {
        (i, p): len(windows[w])
        for (i, p), w in pos_of.items()
        if len(windows[w]) >= 2
    }
    assert got == expect and got, "flagged spans must match the twin exactly"
    # doc 3's self-repeats and doc 4 are absent
    assert not any(d in (3, 4) for (d, _) in got)


def test_importance_logweight_twin(spark):
    """Pure-Python DSIR twin: target-typical docs weigh positive,
    raw-typical negative; micro math exact; empty-token doc gets NULL."""
    import math

    from pyspark.sql import Row

    target_docs = [(100 + i, "clean prose tokens here") for i in range(3)]
    raw = [
        (1, "clean prose tokens here"),       # target-typical
        (2, "spam spam spam buy now"),        # raw-only mass
        (3, "!!! ???"),                        # zero regex tokens -> NULL
    ]
    tdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in target_docs])
    rdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in raw])
    tv = textstats.token_frequencies(tdf, "doc_id", "text")
    out = {r["doc_id"]: r for r in
           textstats.importance_logweight(rdf, "doc_id", "text",
                                          target_vocab=tv, top_k=10).collect()}

    from collections import Counter
    tcnt = Counter(t for _, x in target_docs for t in x.split())
    rcnt = Counter(t for _, x in raw for t in x.lower().split() if t.isalnum())
    t_total, r_total = sum(tcnt.values()), sum(rcnt.values())
    mt = {w: round(math.log(c / t_total) * 1e6) for w, c in tcnt.items()}
    mr = {w: round(math.log(c / r_total) * 1e6) for w, c in rcnt.items()}
    ot = round(math.log(0.5 / t_total) * 1e6)
    orr = round(math.log(0.5 / r_total) * 1e6)

    for i, x in raw:
        toks = [t for t in x.lower().split() if t.isalnum()]
        row = out[i]
        assert row["n_tokens"] == len(toks), i
        if not toks:
            assert row["logweight"] is None
            continue
        s = sum(mt.get(t, ot) - mr.get(t, orr) for t in toks)
        assert row["logweight"] == s / 1e6, i
    assert out[1]["logweight"] > 0 > out[2]["logweight"]


def test_importance_logweight_empty_raw_vocab_releases_target(spark):
    """Failure-path hygiene: when the raw vocabulary is empty, the
    already-persisted target vocab must be unpersisted before the
    ValueError propagates (no orphaned pin for the life of the session)."""
    import pytest
    from pyspark.sql import Row

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    docs = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    target = textstats.token_frequencies(docs, "doc_id", "text")
    empty = spark.createDataFrame([], "token string, tf long")
    with pytest.raises(ValueError, match="empty raw vocabulary"):
        textstats.importance_logweight(
            docs, "doc_id", "text", target_vocab=target, raw_vocab=empty
        )
    assert jsc.getPersistentRDDs().size() == before


def test_remove_duplicate_spans_twin(spark):
    """Removal half of duplicate_spans: keep-first by (doc_id, pos),
    later occurrences' token coverage cut, in-doc-only repeats and
    sub-k docs untouched, empty docs survive with empty text; exact
    match against a pure-Python twin of the whole rule."""
    from pyspark.sql import Row

    shared = "alpha beta gamma delta epsilon"  # 5 tokens, k=3 -> 3 windows
    docs = [
        (1, f"one two {shared} end1"),         # global first -> keeps it all
        (2, f"{shared} other tail here"),      # loses the shared region
        (3, "three four five loop loop loop loop"),  # in-doc only
        (4, "tiny doc"),                        # < k tokens
        (5, ""),                                # token-free
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    out = {
        r["doc_id"]: r
        for r in textstats.remove_duplicate_spans(
            df, "doc_id", "text", span_tokens=3
        ).collect()
    }

    # pure-python twin
    from collections import defaultdict

    k = 3
    occurrences = defaultdict(list)
    toks_of = {}
    for i, t in docs:
        toks = t.lower().split()
        toks_of[i] = toks
        for p in range(len(toks) - k + 1):
            occurrences[" ".join(toks[p:p + k])].append((i, p + 1))
    cut = defaultdict(set)
    for occs in occurrences.values():
        if len({d for d, _ in occs}) < 2:
            continue
        for d, p in sorted(occs)[1:]:
            cut[d].update(range(p, p + k))
    for i, _ in docs:
        kept = [t for j, t in enumerate(toks_of[i], 1) if j not in cut[i]]
        assert out[i]["text"] == " ".join(kept), i
        assert out[i]["n_kept_tokens"] == len(kept), i
        assert out[i]["n_removed_tokens"] == len(toks_of[i]) - len(kept), i
    # sanity on the scenario itself: doc 2 actually lost the region
    assert out[2]["text"] == "other tail here"
    assert out[1]["n_removed_tokens"] == 0 and out[3]["n_removed_tokens"] == 0
    assert out[5]["text"] == "" and out[5]["n_kept_tokens"] == 0


def test_remove_duplicate_spans_winner_is_aggregation_not_window(spark):
    """Plan shape: first-occurrence resolution is a partial-combinable
    min(struct) aggregate on the span hash — no Window operator (a
    window over the hash would serialize the corpus's most-repeated
    span into one task)."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    out = textstats.remove_duplicate_spans(df, "doc_id", "text", span_tokens=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_exact_mode_never_evicts_caller_vocab_cache(spark):
    """top_k=None (exact mode): the scorer must not persist the caller's
    own amortized vocab frame — releasing the scorer's output previously
    evicted the caller's cache via CacheManager sameResult matching."""
    from pyspark.sql import Row
    from csv_cruncher_spark.operators.dedup import release

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello world hello"), Row(doc_id=2, text="world")]
    )
    vocab = textstats.token_frequencies(docs, "doc_id", "text").persist()
    vocab.count()
    out = textstats.unigram_logprob(docs, "doc_id", "text", vocab=vocab, top_k=None)
    rows = out.collect()
    assert len(rows) == 2
    release(out)  # must be a no-op for the caller's frame
    assert vocab.is_cached, "caller's persisted vocab was evicted"
    vocab.unpersist()


def test_sortorder_guard_no_false_positive_on_desc_named_column(spark):
    """A column literally NAMED 'a DESC b' is a plain value expression:
    the node-class detection must not reject it (the old rendering
    heuristic would)."""
    from pyspark.sql import functions as F

    from csv_cruncher_spark.operators import ranking

    df = spark.createDataFrame(
        [(1, "s", 5, 1), (2, "s", 9, 1)],
        ["doc_id", "src", "a DESC b", "cost"],
    )
    out = ranking.cap_per_group(
        df, "src", k=1, id_col="doc_id",
        order=F.col("a DESC b"), descending=True,
    )
    assert [r["doc_id"] for r in out.collect()] == [2]


# --- corpus_drift (KL divergence diagnostic) -----------------------------


def test_corpus_drift_zero_for_identical_mix(spark):
    from csv_cruncher_spark.operators.textstats import corpus_drift

    # two groups with IDENTICAL token distributions -> KL == 0 exactly
    rows = [("a", "x x y"), ("b", "x x y"), ("a", "y z"), ("b", "y z")]
    df = spark.createDataFrame(rows, "src STRING, text STRING")
    out = {r.src: r for r in corpus_drift(df, "src", "text").collect()}
    assert out["a"].kl_micro == 0.0
    assert out["b"].kl_micro == 0.0
    assert out["a"].n_tokens == 5


def test_corpus_drift_detects_skewed_group(spark):
    from csv_cruncher_spark.operators.textstats import corpus_drift

    # healthy groups dominate the corpus; one group floods boilerplate
    rows = (
        [("ok1", "alpha beta gamma delta spam")] * 5
        + [("ok2", "alpha beta gamma delta spam")] * 5
        + [("flood", "spam spam spam spam spam")] * 2
    )
    df = spark.createDataFrame(rows, "src STRING, text STRING")
    out = {r.src: r for r in corpus_drift(df, "src", "text").collect()}
    # the boilerplate-flooded group diverges much further from the
    # corpus mix than the healthy ones (which differ only by the flood's
    # dilution of the corpus totals)
    assert out["flood"].kl_micro > 10 * out["ok1"].kl_micro
    assert out["ok1"].kl_micro >= 0


def test_corpus_drift_layout_independent(spark):
    from csv_cruncher_spark.operators.textstats import corpus_drift

    rows = [(f"s{i % 3}", f"tok{i % 11} tok{i % 7} common") for i in range(120)]
    df = spark.createDataFrame(rows, "src STRING, text STRING")
    a = sorted(map(tuple, corpus_drift(df, "src", "text").collect()))
    b = sorted(map(tuple, corpus_drift(df.repartition(13), "src", "text").collect()))
    assert a == b
