"""The operators package re-exports every public operator: users write
`from csv_cruncher_spark.operators import X` (or ops.X) for ALL of
them — a new module/function must register here, not just import-path
deep (round-5 review finding: curriculum and five round-5 operators
were missing from the package surface)."""

import csv_cruncher_spark.operators as ops


def test_every_module_registered():
    for mod in [
        "bloom", "boilerplate", "bpe", "corpus", "crawl", "curriculum",
        "decontam",
        "dedup", "joins", "multimodal", "packing", "ranking",
        "sampling", "shuffle", "similarity", "textstats",
    ]:
        assert hasattr(ops, mod), mod
        assert mod in ops.__all__, mod


def test_every_public_operator_reexported():
    for fn in [
        "boilerplate_lines", "remove_boilerplate_lines", "dedup_paragraphs",
        "build_corpus", "build_curriculum",
        "contamination_report", "decontaminate",
        "embedding_contamination_report",
        "pack_sequences", "percentile_filter", "cap_per_group",
        "token_budget_filter", "hash_sample", "stratified_sample",
        "assign_split", "temperature_fractions", "temperature_sample",
        "epoch_shuffle", "unigram_logprob", "bigram_logprob",
        "importance_logweight", "duplicate_spans", "remove_duplicate_spans",
        "asof_join", "asof_join_bucketed", "interval_join",
        "release", "dropped_buckets",
        "chunk_documents", "quantile_buckets", "gopher_quality_filter",
        "kmeans_fit_exact", "bpe_train", "bpe_encode", "word_frequencies",
        "tfidf_keywords", "zipf_fit",
        "hll_build", "hll_merge", "hll_estimate", "crawl_schedule",
        "focused_crawl_plan",
    ]:
        assert callable(getattr(ops, fn, None)), fn
        assert fn in ops.__all__, fn
