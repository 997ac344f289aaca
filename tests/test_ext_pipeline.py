"""Curation pipeline + word shingles + grouped top-k vs DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import pipeline, textstats
from dbt_databricks_metrics_spark.ext.dedup import word_shingles
from dbt_databricks_metrics_spark.operators.topk import topk_per_group
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_curate_monotone_funnel(docs):
    stats = pipeline.curation_stats(docs, min_quality=0.4, langs=("en",)).first()
    assert stats["n_raw"] >= stats["n_quality"] >= stats["n_lang"] >= stats["n_curated"]
    assert stats["n_curated"] > 0
    assert stats["total_ws_tokens"] > 0


def test_curate_matches_manual_composition(docs):
    cur = pipeline.curate(docs, min_quality=0.4, langs=("en",), dedup_mode="exact")
    manual = textstats.document_stats(docs)
    manual = manual.filter(
        (F.col("quality_score_raw") >= 0.4) & (F.col("lang_guess") == "en")
    )
    # exact dedup keeps all rows here (all fixture texts distinct)
    assert cur.count() == manual.count()
    assert set(r["doc_id"] for r in cur.select("doc_id").collect()) == set(
        r["doc_id"] for r in manual.select("doc_id").collect()
    )


def test_curate_minhash_mode_runs(docs):
    n = pipeline.curate(
        docs.limit(100), min_quality=0.0, langs=None, dedup_mode="minhash"
    ).count()
    assert 0 < n <= 100


def test_curate_bad_mode(docs):
    with pytest.raises(ValueError, match="unknown dedup_mode"):
        pipeline.curate(docs, dedup_mode="fuzzy")


def test_word_shingles(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",)], "text string")
    rows = df.select(word_shingles("text", 3).alias("s")).first()["s"]
    assert "the quick brown" in rows and "brown fox jumps" in rows
    assert len(rows) == 3


def test_topk_per_group_vs_oracle(docs, duck):
    df = topk_per_group(
        docs.select("doc_id", "lang", "n_chars"),
        group_cols=["lang"],
        order_col="n_chars",
        k=3,
        tiebreakers=["doc_id"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT doc_id, lang, n_chars FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id
        ) <= 3
        """,
    )


def test_curate_cluster_mode_transitive(spark):
    """cluster mode keeps exactly one representative per near-dup
    component — a chain of perturbed copies collapses to its min id."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from all the hunters"
    )
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base + " one", "en", "web", len(base) + 4),
        (3, base + " one two", "en", "web", len(base) + 8),
        (50, "completely different text about spark query engines and the "
             "catalyst optimizer that shares no shingles with the fox story "
             "at all in any way whatsoever for this test", "en", "web", 150),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cur = pipeline.curate(
        docs, min_quality=0.0, langs=None, dedup_mode="cluster",
        minhash_threshold=0.7,
    )
    kept = sorted(r.doc_id for r in cur.select("doc_id").collect())
    assert kept == [1, 50]


def test_curate_lm_gate(spark, sf_dir):
    """The CCNet-style LM gate keeps only low-perplexity tiers and drops
    unscorable docs; disabled by default."""
    from dbt_databricks_metrics_spark.ext import lm as ext_lm
    from dbt_databricks_metrics_spark.ext import pipeline as ext_pipeline
    from dbt_databricks_metrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = ext_pipeline.curate(docs, min_quality=0.3, langs=None, dedup_mode="none")
    gated = ext_pipeline.curate(
        docs, min_quality=0.3, langs=None, dedup_mode="none",
        lm_bucket_max=2, lm_buckets=3,
    )
    n_base, n_gated = base.count(), gated.count()
    assert 0 < n_gated < n_base  # tier 3 removed

    # gate membership must agree with ppl_buckets computed standalone
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in ext_lm.ppl_buckets(ext_lm.lm_doc_scores(base), n_buckets=3).collect()
    }
    kept_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    for did, b in buckets.items():
        if b is not None and b <= 2:
            assert did in kept_ids
        else:
            assert did not in kept_ids


def test_cluster_best_keeps_highest_quality_duplicate(spark):
    """cluster_best picks the best-quality member per near-dup component
    (min id on ties), while plain cluster keeps the min id."""
    from dbt_databricks_metrics_spark.ext.pipeline import curate

    rich = (
        "The quick brown fox jumps over the lazy dog near the quiet river "
        "bank, and the careful reader follows every detailed sentence with "
        "growing interest in this reasonably long passage of plain text."
    )
    # doc 1 = the clean text defaced with punctuation junk (lower quality);
    # doc 2 = the clean version → near-dup pair where the HIGHER id wins
    richer = rich
    rich = rich + " !!!! ???? #### @@@@ %%%% ^^^^ &&&& **** (((( ))))"
    unrelated = (
        "Completely different content about distributed query engines and "
        "columnar execution strategies, long enough to pass the quality "
        "gate with unique vocabulary and normal sentence structure here."
    )
    df = spark.createDataFrame(
        [(1, rich, "en"), (2, richer, "en"), (3, unrelated, "en")],
        "doc_id long, text string, lang string",
    )
    base_kwargs = dict(min_quality=0.0, langs=None, minhash_threshold=0.6)

    plain = curate(df, dedup_mode="cluster", **base_kwargs)
    best = curate(df, dedup_mode="cluster_best", **base_kwargs)
    plain_ids = {r["doc_id"] for r in plain.collect()}
    best_ids = {r["doc_id"] for r in best.collect()}
    assert plain_ids == {1, 3}, plain_ids  # min-id representative
    # sanity: the pair really is a near-dup cluster and 2 scores higher
    from dbt_databricks_metrics_spark.ext import textstats as ts
    import pyspark.sql.functions as F

    q = {
        r["doc_id"]: r["quality_score_raw"]
        for r in ts.document_stats(df).select("doc_id", "quality_score_raw").collect()
    }
    assert q[2] > q[1]
    assert best_ids == {2, 3}, best_ids  # best-quality representative


def test_curation_v2_funnel_monotone(spark, sf_dir):
    from dbt_databricks_metrics_spark.ext.pipeline import curation_v2_stats
    from dbt_databricks_metrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    (r,) = curation_v2_stats(
        docs, min_quality=0.5, substr_min_len=48, gopher_min_words=30,
        gopher_required_words=("the", "a"),
    ).collect()
    assert r["n_raw"] >= r["n_quality"] >= r["n_gopher"] >= r["n_dedup"] > 0
    assert 0 <= r["n_substr_touched"] <= r["n_dedup"]
    assert r["substr_chars_removed"] >= 0
    assert r["total_ws_tokens_clean"] > 0


def test_curation_v2_substr_stage_actually_cuts(spark):
    from dbt_databricks_metrics_spark.ext.pipeline import curation_v2_stats

    base = ("the a quick brown fox jumps over the lazy dog near a river "
            "bank and walks home slowly tonight under the quiet stars now")
    shared = "SHARED-BOILERPLATE-SEGMENT-THAT-REPEATS-ACROSS-DOCS-" * 2
    rows = [(i, base + " " + shared + f" tail{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    (r,) = curation_v2_stats(
        docs, min_quality=0.0, substr_min_len=32, gopher_min_words=5,
        gopher_required_words=("the", "a"),
    ).collect()
    assert r["n_dedup"] == 6  # distinct tails -> no exact dups
    assert r["n_substr_touched"] >= 5  # later copies lose the shared span
    assert r["substr_chars_removed"] > 0
