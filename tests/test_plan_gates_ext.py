"""Sweeping 100 TB-posture plan gates over the [EXT] contract queries.

For every lazy ext query plan (streaming/engine-building entries are
exercised elsewhere): no CartesianProduct, no row-at-a-time Python
(BatchEvalPython), Arrow kernels only where declared (media), and no
Exchange SinglePartition outside the known-tiny reductions (global
aggregates to one row / driver-bounded top-k are fine — a
SinglePartition exchange feeding a per-row operator is not).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# ext queries whose contract fn builds a LAZY plan against sf_dir without
# running its own engine/stream (safe to inspect without side effects)
LAZY_EXT_QUERIES = [
    "doc_stats",
    "doc_repetition",
    "vocab_topk",
    "chunk_documents",
    "dedup_exact_summary",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "contamination_pairs",
    "winnow_overlap_pairs",
    "gram_novelty",
    "lm_doc_scores",
    "ppl_buckets",
    "embedding_dup_pairs",
    "topk_similar",
    "topk_join",
    "hard_negatives",
    "srp_similar_pairs",
    "sessionize",
    "session_stats",
    "tumbling_window",
    "sliding_window",
    "user_activity",
    "redact_documents",
    "quantize_roundtrip",
    "keyword_search",
    "bm25_search",
    "stratified_sample",
    "pack_bins",
    "topk_docs_per_lang",
    "profile_orders",
    "asof_join",
    "interval_join",
    "dsir_weights",
    "decontaminated_docs",
    "funnel_steps",
    "cohort_retention",
    "doc_vectors",
    "fuzzy_match_pairs",
    "cdc_apply",
    "debounced_events",
    "interpolated_revenue",
    "triangle_counts",
    "bpe_encoded",
    "hybrid_search",
    "paragraph_dedup",
    "substring_dedup",
    "reranked_search",
    "pq_codes",
    "pq_topk",
    "ivfpq_topk",
    # bloom_prune's construction runs the bitset build eagerly
    # (bloom_build_local's config-bounded eager cache), so the inspected
    # plan covers only the probe side; the build side's plan is gated in
    # tests/test_operators_bloom.py::test_build_plan_quality
    "bloom_prune",
    "source_reputation",
    # round-4 rotation-pool ops (cluster_keep_best excluded: its
    # duplicate_clusters input runs eager localCheckpoint rounds, like
    # dup_clusters)
    "phrase_search",
    "corpus_diff",
    "shard_plan",
    "incremental_targets",
    "token_budget",
    # late round-4 ops (calibration excluded: logreg training collects
    # eagerly; derived_measure/pivot_orders build engines)
    "l_diversity",
    "t_closeness",
    "truncation_eval",
    "hamming_topk",
    "split_leakage",
    "oov_rate",
    "event_transitions",
    "training_set",
    # latest round-4 ops (ece excluded: eager logreg training like
    # calibration; derived_measure/pivot_orders build engines)
    "top_next_events",
    "privacy_release",
    "token_stream_pack",
    "token_fertility",
    "json_props",
    "embedding_drift",
    # round-5 ops
    "media_decode",
    "containment_pairs",
    "cohen_kappa",
    "collocations",
    "time_in_state",
    "drift_report",
    "ab_welch",
]

# ops whose FINAL reduction is a legitimately tiny single partition
# (global 1-row aggregates, driver-bounded top-k merges, percentile
# cutoff rows); the gate still rejects cartesians/Python for them
_SINGLE_PARTITION_OK = {
    "dedup_exact_summary",  # two 1-row aggregates cross-joined
    "vocab_topk",  # TakeOrderedAndProject merge
    "topk_similar",
    "keyword_search",
    "bm25_search",
    "lm_doc_scores",  # 1-row vocab-size aggregate broadcast
    "ppl_buckets",  # 1-row percentile-cutoff aggregate broadcast
    "quantize_roundtrip",  # 1-row tolerance summary
    "profile_orders",  # single stats row, unpivoted driver-side
    "simhash_pairs",  # banded-vs-brute delta reduction (1-row counts)
    "dsir_weights",  # two 1-row model-total aggregates broadcast
    "doc_vectors",  # 1-row corpus-count aggregate broadcast (lazy N, r11)
    "funnel_steps",  # 1-row step-count vector, unpivoted
    "interpolated_revenue",  # 1-row spine min/max bounds aggregate
    "hybrid_search",  # rank windows over two top-k_each (20-row) lists
    "reranked_search",  # rank window over the 30-row candidate list
    "pq_codes",  # seed-code window over the 8 post-limit seed rows
    "pq_topk",  # same seeds + rank window over the 15 top rows
    "ivfpq_topk",  # same seeds + rank window over the 10 top rows
    "bloom_prune",  # 1-row accounting aggregate + broadcast n_keys row
    "phrase_search",  # TakeOrderedAndProject top-k merge
    "l_diversity",  # 1-row governance report aggregate
    "t_closeness",  # m-row (bucket-cardinality) global cumsum + 1-row report
    "hamming_topk",  # TakeOrderedAndProject merge
    "privacy_release",  # t-stage m-row cumsum + 1-row release summary
    "embedding_drift",  # |dims|-row term fold + 1-row result
    "json_props",  # |event-types|-row aggregate may coalesce to one task
    "token_fertility",  # |langs|-row aggregate, same
    "top_next_events",  # |types|^2-row matrix ranking windows
    "token_budget",  # tier running-total window over |score-domain| rows
    "cohen_kappa",  # two 1-row aggregates cross-joined (agreement x pe)
    "collocations",  # TakeOrderedAndProject top-20 merge over pair counts
    "ab_welch",  # 2-row cohort moment table
    "drift_report",  # bins-sized spine + global-CDF windows over 10 rows
}


@pytest.mark.parametrize("name", LAZY_EXT_QUERIES)
def test_ext_plan_quality(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name  # row-at-a-time Python
    assert "ArrowEvalPython" not in plan, name  # media kernels only
    if name not in _SINGLE_PARTITION_OK:
        assert "Exchange SinglePartition" not in plan, name
