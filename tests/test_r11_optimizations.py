"""Round-11 optimization pins.

Two families:

1. ``skew_guard`` (substr / gram_novelty / containment_pairs /
   ssjoin_pairs): the guarded path must return EXACTLY the unguarded
   result on corpora WITH hot keys (the guard re-derives the same
   count/exemplar through a broadcast instead of a window partition),
   and its plan must show the partial-agg + broadcast pre-filter so no
   window partition ever exceeds the threshold (guide §2.5).
2. Diamond cuts: ssjoin's candidate self-join reads ONE checkpointed
   prefix table (the former repartition-for-stage-reuse never produced
   a ReusedExchange — the planner broadcasts one side — and each side
   recomputed the whole prefix pipeline); the IDF vectorizer's tf table
   feeds its df-aggregate and the join probe from ONE checkpoint, and
   its corpus count rides in the lazy plan instead of an eager job.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def _hot_corpus(spark, n=400):
    """Synthetic corpus with ONE hot token/gram/fingerprint family: every
    doc shares a boilerplate sentence (hot keys with df == n) next to a
    unique payload (cold keys)."""
    boiler = "shared boilerplate sentence repeated in every document body"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.sha2(F.col("id").cast("string"), 256),
            F.lit(" " + boiler + " "),
            F.sha2((F.col("id") + 7).cast("string"), 256),
        ).alias("text"),
    )


# ---------------------------------------------------------------------------
# skew_guard equivalence on hot-key corpora
# ---------------------------------------------------------------------------


def test_substr_skew_guard_equivalent_and_bounded(spark):
    from dbt_databricks_metrics_spark.ext.substr import dedup_exact_substrings

    docs = _hot_corpus(spark, 60)
    base = dedup_exact_substrings(docs, min_len=48, keep="first")
    guarded = dedup_exact_substrings(docs, min_len=48, keep="first", skew_guard=10)
    assert _rows(base) == _rows(guarded)
    # keep='none' exercises the other exemption path
    b2 = dedup_exact_substrings(docs, min_len=48, keep="none")
    g2 = dedup_exact_substrings(docs, min_len=48, keep="none", skew_guard=10)
    assert _rows(b2) == _rows(g2)
    plan = _plan(guarded)
    # the guard's shape: a broadcast anti-join removes hot fps before the
    # window, a broadcast inner join re-attaches their aggregates
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "Window" in plan  # cold keys still window (bounded groups)


def test_gram_novelty_skew_guard_equivalent(spark):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty

    docs = _hot_corpus(spark, 60)
    for h in (False, True):
        base = gram_novelty(docs, n=3, hash_ngrams=h)
        guarded = gram_novelty(docs, n=3, hash_ngrams=h, skew_guard=10)
        assert _rows(base) == _rows(guarded), f"hash_ngrams={h}"
    plan = _plan(gram_novelty(docs, n=3, skew_guard=10))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_gram_novelty_skew_guard_null_text(spark):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "a b c d"), (None, "a b c d")],
        "doc_id long, text string",
    )
    assert _rows(gram_novelty(docs, n=3)) == _rows(
        gram_novelty(docs, n=3, skew_guard=2)
    )


def test_containment_skew_guard_equivalent(spark):
    from dbt_databricks_metrics_spark.ext.dedup import containment_pairs

    docs = _hot_corpus(spark, 60)
    base = containment_pairs(docs, k=5, threshold=(3, 5), max_df=10)
    guarded = containment_pairs(
        docs, k=5, threshold=(3, 5), max_df=10, skew_guard=True
    )
    assert _rows(base) == _rows(guarded)
    # plan read from a FRESH (unexecuted) frame — an executed AQE plan
    # prints final + initial trees and double-counts nodes
    plan = _plan(
        containment_pairs(docs, k=5, threshold=(3, 5), max_df=10, skew_guard=True)
    )
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    # the guarded plan has ONE window left (the per-doc size), not two
    import re

    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 1, plan


def test_ssjoin_skew_guard_equivalent(spark):
    from dbt_databricks_metrics_spark.ext.ssjoin import ssjoin_pairs

    docs = _hot_corpus(spark, 60)
    base = ssjoin_pairs(docs, k=5, threshold=0.5)
    guarded = ssjoin_pairs(docs, k=5, threshold=0.5, skew_guard=10)
    assert _rows(base) == _rows(guarded)


def test_skew_guard_rejects_degenerate_threshold(spark):
    import pytest

    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty
    from dbt_databricks_metrics_spark.ext.ssjoin import ssjoin_pairs
    from dbt_databricks_metrics_spark.ext.substr import dedup_exact_substrings

    docs = _hot_corpus(spark, 3)
    for call in (
        lambda: dedup_exact_substrings(docs, skew_guard=1),
        lambda: gram_novelty(docs, skew_guard=0),
        lambda: ssjoin_pairs(docs, skew_guard=1),
    ):
        with pytest.raises(ValueError):
            call()


# ---------------------------------------------------------------------------
# diamond cuts
# ---------------------------------------------------------------------------


def test_ssjoin_prefix_pipeline_computed_once(spark):
    """The candidate self-join's sides must read the SAME checkpointed
    prefix table — no repartition exchanges, no duplicated window/order
    pipeline in the final plan (it lives behind the checkpoint leaf)."""
    from dbt_databricks_metrics_spark.ext.ssjoin import ssjoin_pairs

    docs = _hot_corpus(spark, 30)
    plan = _plan(ssjoin_pairs(docs, k=5, threshold=0.5))
    assert "REPARTITION_BY_COL" not in plan
    # prefix pipeline (window + per-doc order) is checkpointed: the final
    # plan contains no Window at all — it reads the RDD leaf twice
    assert "Window" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_idf_vectorizer_inline_count_matches_literal(spark):
    """n_docs=None now rides as a lazy 1-row aggregate; it must equal the
    eager-count path bit for bit (including a NULL id, which the old
    distinct().count() counted as one group)."""
    from dbt_databricks_metrics_spark.ext.vectors import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c"), (None, "a d"), (3, None), (3, "a b")],
        "doc_id long, text string",
    )
    n = docs.select("doc_id").distinct().count()
    auto = hashed_doc_vectors(docs, dim=8, hash_fn="md5")
    lit = hashed_doc_vectors(docs, dim=8, hash_fn="md5", n_docs=n)
    assert _rows(auto) == _rows(lit)


def test_idf_vectorizer_tf_checkpointed_once(spark):
    """tf feeds the df-aggregate AND the idf join probe; the checkpoint
    makes that one computation (the old tree re-derived the (id, tok)
    aggregation twice). Plan pin: the final plan reads an RDD leaf and
    contains exactly one tok-keyed aggregate pair (the df count)."""
    from dbt_databricks_metrics_spark.ext.vectors import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c")], "doc_id long, text string"
    )
    plan = _plan(hashed_doc_vectors(docs, dim=8, hash_fn="md5", n_docs=2))
    assert "Scan ExistingRDD" in plan
    # the (id, tok) explode+aggregate lives behind the checkpoint: no
    # Generate (explode) survives in the final plan
    import re

    assert len(re.findall(r"^\(\d+\) Generate\b", plan, re.M)) == 0, plan
