"""Registry-wide physical-plan audit: the scale claims in SCALE.md, enforced.

Every registered query's executed plan must be free of CartesianProduct and
row-at-a-time Python evaluation (BatchEvalPython — Python may touch data
only through Arrow: ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
BroadcastNestedLoopJoin is allowed only where a cross-shaped join is the
operator's definition (brute-force ANN scores every query against every
corpus row; the sync-stats summary crosses two one-row aggregates).

Scope: segments an operator materializes eagerly (MinHash intermediates,
connected-components rounds) appear as checkpoint scans in the final plan
and are not re-audited here; their compute plans are pinned in PLANS.md via
SPARK_GRAFT_PLAN_CAPTURE (which this test also sets, so the ngram-jaccard
final checkpoint is seen lazily).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from aci_export_spark import harness
from tests.conftest import SF_SMOKE

harness._ensure_all_registered()

#: queries whose plan legitimately contains BroadcastNestedLoopJoin
BNLJ_ALLOWED = {
    "llm_sim_bruteforce_topk",  # definitionally all-pairs (tiny query side broadcast)
    "llm_hard_negatives",  # same all-pairs shape: tiny query side broadcast,
    # label-mismatch predicate is non-equi by definition
    "llm_sim_mmr_rerank",  # candidate pool comes from the brute-force
    # scorer (same all-pairs shape); swap in any indexed ANN path at scale
    "llm_sim_sq8_topk",  # compressed brute scan by definition (tiny query
    # pool broadcast against the int8 code table); compose under IVF cells
    # for a pruned scan at corpus scale
    "llm_sim_ivf_recall_audit",  # the audit's GROUND TRUTH side is the
    # brute-force scorer by definition (recall needs the exact answer);
    # tiny query set broadcast — the audited IVF side is an equi-join
    "a9_sync_stats",  # cross of two single-row aggregate results
    # decorrelated global-scalar subqueries: a non-equi filter against a
    # broadcast ONE-row aggregate — the plan Spark itself picks for scalar
    # subqueries, and the right one at any scale (1-row build side)
    "q11_important_stock",
    "q22_global_balance_anti",
    "llm_quality_unigram_lm",  # 1-row (total, vocab) aggregate broadcast
    "llm_quality_bigram_lm",  # same shape on the bigram model: 1-row
    # (total, vocab) aggregate broadcast cross
    "llm_pmi_collocations",  # 1-row N (tokens) and M (bigrams) aggregate
    # broadcast crosses feeding the rational PMI rank
    "llm_doc_keywords",  # 1-row corpus-count aggregate broadcast
    "basket_brand_pairs",  # 1-row basket-total aggregate broadcast
    "graph_brand_triangles",  # composes basket_brand_pairs (same 1-row cross)
    "graph_brand_pagerank",  # composes basket_brand_pairs too; the bounded
    # single-task iteration keeps the co-occurrence lineage in the audited
    # plan (the old distributed loop's count() action hid it)
    "llm_curation_kept_corpus_v2",  # composes the unigram 1-row broadcast
    "llm_curation_kept_corpus_v3",  # composes v2 (same unigram 1-row
    # broadcast cross); the added span-exposure gate is pure equi-joins
    "docs_bm25_topk",  # 1-row (n_docs, total_tokens) corpus-stats broadcast
    "docs_hybrid_rrf_topk",  # composes the bm25 1-row stats cross AND the
    # brute-force dense ranker (all-pairs by definition on the tiny query set)
    "docs_ranker_agreement",  # same composition as docs_hybrid_rrf_topk:
    # bm25 1-row stats cross + the brute-force dense ranker; the agreement
    # fold itself is a pool-bounded equi-join
    "events_value_histogram",  # 1-row global min/max broadcast
    "events_zorder_pruning_stats",  # 1-row rows-matching aggregate crossed in
    "llm_lsh_index_upsert",  # cross of two single-row invariant aggregates
    "events_chi2_cells",  # 1-row grand-total aggregate broadcast
    "j_bloom_prefilter_join",  # cross of three single-row count aggregates
    "events_bitemporal_state",  # 1-row (T, V) cutoff aggregate broadcast ×2
    "llm_weighted_sample",  # 1-row (total, bucket-size) aggregate broadcast
    "dq_join_key_skew",  # 1-row (n_keys, n_rows) aggregate broadcast
    "dq_value_drift_cells",  # 1-row bounds + totals aggregate broadcasts
    "orders_abc_classification",  # 1-row revenue-total aggregate broadcast
    "orders_rfm_segments",  # 1-row corpus-max-date aggregate broadcast
    "llm_quality_kn_bigram",  # 1-row bigram-type-count (T) broadcast cross
    # + 1-row corpus-mean broadcast — the unigram/bigram LM shape
    "llm_quality_kn_trigram",  # same LM shape one order up: 1-row
    # bigram/trigram-type-count broadcasts + the corpus-mean cross
    "events_survival_km",  # 1-row corpus-max-day (censoring horizon)
    # aggregate broadcast
    "events_ks_two_sample",  # 1-row (n_a, n_b) sample-size aggregate
    # broadcast crossed into the gap scan — the scalar-subquery shape
    "events_cochran_armitage",  # 1-row band-weight sums + 1-row N
    # aggregate broadcasts crossed into the per-type statistic
    "llm_fisher_terms_fdr",  # 1-row corpus-count (N) aggregate broadcast
    # crossed into the vocabulary-bounded margin table
    "llm_sim_binary_hamming_topk",  # tiny query side broadcast with the
    # definitional non-equi self-exclusion — the sq8 compressed-brute-scan
    # shape; composes under IVF cells at corpus scale
    "graph_brand_kcore",  # composes basket_brand_pairs (the same 1-row
    # basket-total broadcast cross as pagerank/triangles)
    "llm_chisq_terms",  # 1-row corpus-doc-count (N) aggregate broadcast
    # cross — the pmi/bm25 global-stats shape; every other join is equi
    "llm_robots_url_filter",  # the build side is a robots RULESET —
    # bounded by definition (RFC 9309 file limit), broadcast prefix-match
    # nested loop is the right plan at any corpus scale
    "llm_retrieval_auc",  # AUC needs the full ranking by definition —
    # the brute-force scorer's tiny-query-broadcast shape with the
    # definitional non-equi self-exclusion; sampled AUC is the dial
}

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_driver_window_priority_names_all_resolve():
    """A renamed query must fail loudly, not silently fall out of the
    driver's 50-entry correctness window."""
    missing = [n for n in harness.DRIVER_WINDOW_PRIORITY if n not in harness.REGISTRY]
    assert not missing, f"DRIVER_WINDOW_PRIORITY names not in registry: {missing}"
    assert len(set(harness.DRIVER_WINDOW_PRIORITY)) == len(harness.DRIVER_WINDOW_PRIORITY)


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_plan_has_no_forbidden_nodes(name, spark, monkeypatch):
    # capture computation plans, not post-materialization checkpoint scans
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CAPTURE", "1")
    df = harness.REGISTRY[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for node in FORBIDDEN:
        assert node not in plan, f"{name}: plan contains {node}"
    if name not in BNLJ_ALLOWED:
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name}: unexpected BroadcastNestedLoopJoin"
