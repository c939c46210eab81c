from . import (
    bloom,
    boilerplate,
    bpe,
    c4,
    classifier,
    corpus,
    curriculum,
    decontam,
    dedup,
    graph,
    joins,
    multimodal,
    packing,
    ranking,
    recall,
    retrieval,
    sampling,
    semdedup,
    shuffle,
    similarity,
    sketch,
    textstats,
)
from .sketch import count_min_build, count_min_estimate
from .c4 import c4_clean
from .classifier import micro_feature_frame, score_micro, train_logreg
from .recall import ann_recall, exact_topk_multi, ivf_topk_multi
from .retrieval import bm25_topk
from .semdedup import semantic_dedup, semantic_dedup_pairs
from .boilerplate import (
    boilerplate_lines,
    dedup_paragraphs,
    remove_boilerplate_lines,
)
from .bpe import bpe_encode, bpe_train, word_frequencies
from .corpus import build_corpus
from .curriculum import build_curriculum
from .decontam import (
    contamination_report,
    decontaminate,
    embedding_contamination_report,
)
from .packing import chunk_documents, pack_sequences
from .ranking import (
    cap_per_group,
    percentile_filter,
    quantile_buckets,
    token_budget_filter,
)
from .sampling import (
    assign_split,
    hash_sample,
    stratified_sample,
    temperature_fractions,
    temperature_sample,
    weighted_sample_topk,
)
from .dedup import (
    dropped_buckets,
    ngram_containment_pairs,
    novelty_scores,
    release,
)
from .graph import derive_link_graph, pagerank_micro
from .shuffle import epoch_shuffle
from .joins import asof_join, asof_join_bucketed, interval_join
from .similarity import kmeans_fit_exact
from .textstats import (
    bigram_logprob,
    tfidf_keywords,
    zipf_fit,
    duplicate_spans,
    gopher_quality_filter,
    importance_logweight,
    pmi_collocations,
    remove_duplicate_spans,
    unigram_logprob,
)

__all__ = [
    "bloom",
    "boilerplate",
    "bpe",
    "c4",
    "c4_clean",
    "classifier",
    "micro_feature_frame",
    "train_logreg",
    "score_micro",
    "recall",
    "ann_recall",
    "exact_topk_multi",
    "ivf_topk_multi",
    "retrieval",
    "bm25_topk",
    "semdedup",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "bpe_train",
    "bpe_encode",
    "word_frequencies",
    "boilerplate_lines",
    "remove_boilerplate_lines",
    "dedup_paragraphs",
    "corpus",
    "curriculum",
    "build_curriculum",
    "decontam",
    "packing",
    "ranking",
    "percentile_filter",
    "cap_per_group",
    "token_budget_filter",
    "sampling",
    "shuffle",
    "epoch_shuffle",
    "build_corpus",
    "contamination_report",
    "decontaminate",
    "embedding_contamination_report",
    "pack_sequences",
    "hash_sample",
    "stratified_sample",
    "assign_split",
    "temperature_fractions",
    "temperature_sample",
    "weighted_sample_topk",
    "dedup",
    "graph",
    "derive_link_graph",
    "pagerank_micro",
    "ngram_containment_pairs",
    "novelty_scores",
    "pmi_collocations",
    "sketch",
    "count_min_build",
    "count_min_estimate",
    "joins",
    "multimodal",
    "similarity",
    "textstats",
    "unigram_logprob",
    "bigram_logprob",
    "importance_logweight",
    "duplicate_spans",
    "remove_duplicate_spans",
    "asof_join",
    "asof_join_bucketed",
    "interval_join",
    "release",
    "dropped_buckets",
    "chunk_documents",
    "quantile_buckets",
    "gopher_quality_filter",
    "kmeans_fit_exact",
    "tfidf_keywords",
    "zipf_fit",
]
