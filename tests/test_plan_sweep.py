"""Whole-surface physical-plan sweep: every `queries()` entry is built
at sf0.001 and its executed plan asserted free of the three patterns
that kill a 100 TB run —

  - CartesianProduct: never acceptable anywhere on this surface (the
    deliberately-exact oracle modes all plan as equi- or broadcast
    joins over bounded sides);
  - BatchEvalPython: row-at-a-time Python UDF — the only Python allowed
    in any plan is Arrow-batched (ArrowEvalPython / mapInPandas);
  - BroadcastNestedLoopJoin: only where the build side is BOUNDED by
    construction, listed in the whitelist below with its reason.

This is the sweep version of tests/test_plan_shapes.py: those tests pin
specific GOOD properties on flagship plans; this one pins the ABSENCE
of the scale-fatal patterns across all ~108 entries, so a new entry (or
a refactor of a shared operator) that introduces one is a red build."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

# entries where BroadcastNestedLoopJoin is a BOUNDED broadcast by
# construction (the crossJoin(broadcast(...)) scalar/bounded-side
# attach), each with the bound that makes it safe at any corpus size
BNLJ_WHITELIST = {
    # 1-row aggregate totals attached via crossJoin(broadcast(total))
    "bm25_search": "1-row n_docs/total-tokens attach (retrieval.py)",
    "corpus_drift_report": "1-row corpus-total attach (textstats.corpus_drift)",
    "doc_tfidf_keywords": "1-row n_docs attach (textstats.tfidf_keywords)",
    "source_skew_report": "1-row grand-total attach (salt.skew_audit)",
    "hub_authority_rank": "1-row MAX normalization attach per HITS "
                          "half-step (graph.hits_micro)",
    "crawl_budget_quota": "two 1-row attaches: Σweight and the leftover "
                          "count L (crawl.apportion_budget)",
    # bounded benchmark/query side broadcast against the corpus
    "embedding_decontam_report": "broadcast benchmark vectors (bounded set)",
    "ivf_recall_at_k": "exact ground truth: broadcast query set x corpus "
                       "(bounded queries; corpus never shuffles)",
}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_entry_plan_has_no_scale_fatal_pattern(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in BNLJ_WHITELIST:
        assert "BroadcastNestedLoop" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — if the build "
            f"side is bounded by construction, whitelist it with the reason"
        )
