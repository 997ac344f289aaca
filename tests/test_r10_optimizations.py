"""Round-10 optimization pins: the restructured operators must keep the
exact semantics the old shapes had (null-key drops, duplicate-id
merging, ragged rows, vocabulary counting) AND keep their new plan
shapes (the gram/shingle explode computed once, map-only vectorizer).

Each test names the hazard the optimization introduced and proves it
closed; the plan-shape asserts pin the structural wins so a later
refactor cannot silently reintroduce the agg+join diamond.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str, op: str) -> int:
    """Count physical nodes named *op* in a formatted plan (each node
    prints once in the tree and once in the details — count details)."""
    import re as _re

    return len(_re.findall(rf"^\(\d+\) {op}\b", plan, _re.M))


# ---------------------------------------------------------------------------
# gram/shingle family: explode-once plan shape + null-key semantics
# ---------------------------------------------------------------------------


def test_substring_dedup_explodes_grams_once(spark):
    from dbt_databricks_metrics_spark.ext.substr import dedup_exact_substrings

    docs = spark.createDataFrame(
        [(1, "x" * 80), (2, "x" * 80)], "doc_id long, text string"
    )
    plan = _plan(dedup_exact_substrings(docs, min_len=48))
    # one Generate = the per-char gram explode computed once (the old
    # agg+join diamond re-derived it on both join sides: two Generates)
    assert _nodes(plan, "Generate") == 1, plan
    assert "Window" in plan


def test_gram_novelty_explodes_grams_once_and_drops_null_text(spark):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, None)],
        "doc_id long, text string",
    )
    out = gram_novelty(docs, n=3)
    # plan read BEFORE execution (an executed AQE plan prints the final
    # AND the initial plan, double-counting nodes)
    assert _nodes(_plan(out), "Generate") == 1
    rows = {r["doc_id"]: r for r in out.collect()}
    # NULL-text doc emits a NULL gram; the old inner join dropped that
    # key, so the windowed version must too (caught live in this round)
    assert rows[3]["n_grams"] == 0 and rows[3]["dup_frac"] is None
    assert rows[1]["dup_frac"] == 1.0


def test_containment_pairs_matches_join_semantics_with_null_text(spark):
    from dbt_databricks_metrics_spark.ext.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps over everything else entirely"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, k=5, threshold=(1, 2), max_df=50).collect()
    ids = {(r["id_a"], r["id_b"]) for r in rows}
    # doc 3 (NULL text -> NULL shingle) must not pair with anything
    assert all(3 not in pair for pair in ids)
    # containment is asymmetric: the short doc is contained in the long
    assert (1, 2) in ids
    for r in rows:
        if (r["id_a"], r["id_b"]) == (1, 2):
            assert r["shared"] * 2 >= r["size_a"]
    # the shingle explode appears once; pair expansion is the 2nd Generate
    plan = _plan(containment_pairs(docs, k=5, threshold=(1, 2), max_df=50))
    assert _nodes(plan, "Generate") == 2, plan


# ---------------------------------------------------------------------------
# map-only idf-less vectorizer: parity edge cases
# ---------------------------------------------------------------------------


def test_hashed_vectors_noidf_merges_duplicate_ids_and_zero_vectors(spark):
    from dbt_databricks_metrics_spark.ext.vectors import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (1, "alpha"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["vector"]
        for r in hashed_doc_vectors(
            docs, dim=4, idf=False, normalize=False
        ).collect()
    }
    # duplicate ids merge their token counts (the old groupBy(id, tok)
    # semantics): 2x alpha + 1x beta across the two rows
    assert len(out) == 3
    assert sum(out[1]) == 3.0
    # empty and NULL text surface as the zero vector, nothing disappears
    assert sum(out[2]) == 0.0 and sum(out[3]) == 0.0


def test_hashed_vectors_noidf_plan_is_shuffle_lean(spark):
    from dbt_databricks_metrics_spark.ext.vectors import hashed_doc_vectors

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(hashed_doc_vectors(docs, dim=4, idf=False))
    # no token explode, no joins — one id-keyed combine is the only
    # exchange (the old plan had 3 exchanges + a zero-vector join-back)
    assert _nodes(plan, "Generate") == 0
    assert "Join" not in plan
    assert _nodes(plan, "Exchange") <= 1, plan


# ---------------------------------------------------------------------------
# logreg single-aggregate gradient: ragged rows + parity with reference
# ---------------------------------------------------------------------------


def test_logreg_train_matches_reference_and_handles_ragged_rows(spark):
    import math

    from dbt_databricks_metrics_spark.ext.classify import logreg_train

    rows = [
        (1, [1.0, 0.0, 2.0]),
        (0, [0.5, 1.0, 0.0]),
        (1, [0.0, 2.0]),  # ragged: zip_with pads NULL -> z NULL -> no
        # contribution at all (identical in the old posexplode plan:
        # resid was already NULL there) — but count(*) still counts it
        (0, [1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "y int, vector array<double>")
    w = logreg_train(df, "y", "vector", dim=3, n_iter=2, lr=0.5)

    # driver-side reference: identical batch-GD arithmetic; only
    # full-width rows carry gradient, n counts every row
    ref = [0.0, 0.0, 0.0]
    for _ in range(2):
        grad = [0.0, 0.0, 0.0]
        for y, x in rows:
            if len(x) != 3:
                continue
            z = sum(a * b for a, b in zip(x, ref))
            r = 1.0 / (1.0 + math.exp(-z)) - y
            for i, xi in enumerate(x):
                grad[i] += r * xi
        ref = [wi - 0.5 * g / len(rows) for wi, g in zip(ref, grad)]
    assert w == pytest.approx(ref, rel=1e-12)


# ---------------------------------------------------------------------------
# LM fused vocabulary: V still counts every corpus token
# ---------------------------------------------------------------------------


def test_lm_vocab_counts_tokens_outside_bigrams(spark):
    from dbt_databricks_metrics_spark.ext import lm

    # doc 3 is a single token ("zeta") that appears in NO bigram — the
    # fused (model + vocab) pass must still count it in V, exactly like
    # the old corpus-wide count_distinct
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma"), (3, "zeta")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r for r in lm.lm_doc_scores(docs).collect()}
    # V = 4 (alpha beta gamma zeta) — zeta only exists OUTSIDE bigrams.
    # doc1 bigrams: "alpha beta", "beta alpha"; c(alpha beta)=1,
    # c(beta alpha)=1, ctx(alpha)=1, ctx(beta)=2 (beta alpha + beta gamma)
    import math

    assert scores[1]["n_bigrams"] == 2
    p1 = math.log((1 + 0.5) / (1 + 0.5 * 4))  # P(beta|alpha)
    p2 = math.log((1 + 0.5) / (2 + 0.5 * 4))  # P(alpha|beta)
    assert scores[1]["avg_logp"] == pytest.approx((p1 + p2) / 2, rel=1e-12)
    # unscorable single-token doc: no bigrams, NULL score — but its token
    # must have entered V (checked via doc 1's denominators above: V=4)
    assert scores[3]["n_bigrams"] == 0 and scores[3]["avg_logp"] is None
