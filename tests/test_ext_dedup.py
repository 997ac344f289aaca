"""Dedup operator tests ([EXT]): exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine — LSH paths validated against exact brute force.

The fixture documents are all distinct, so near-dup fixtures are built by
unioning perturbed copies of real fixture rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import dedup
from dbt_databricks_metrics_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def docs_with_dups(docs):
    """documents ∪ near-copies (doc_id+10000, one word changed) ∪ exact
    normalized copies (doc_id+20000, case/whitespace mangled)."""
    near = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    exact = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(near).unionByName(exact).cache()


def test_exact_dedup_no_dups_is_identity(docs):
    assert dedup.exact_dedup(docs).count() == docs.count()
    assert dedup.exact_duplicate_groups(docs).count() == 0


def test_exact_dedup_case_whitespace(spark, docs):
    # upper-cased + padded copies collapse onto the original (lower id kept)
    mangled = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "), F.col("text"), F.lit("   "))).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    u = docs.unionByName(mangled)
    kept = dedup.exact_dedup(u)
    assert kept.count() == docs.count()
    assert kept.filter(F.col("doc_id") >= 20000).count() == 0
    groups = dedup.exact_duplicate_groups(u)
    assert groups.count() == 20
    row = groups.orderBy("doc_ids").first()
    assert len(row["doc_ids"]) == 2


def test_ngram_jaccard_pairs_finds_near_dups(docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(
        docs_with_dups, threshold=0.8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # each near-copy must pair with its source (tiny 'extra' suffix)
    for i in range(30):
        assert any(a == i and b == i + 10000 for a, b in found), i
    # jaccard in (0, 1]
    assert all(0 < r["jaccard"] <= 1 for r in pairs)


def test_minhash_lsh_matches_exact_bruteforce(docs_with_dups):
    """LSH pairs ⊆ exact pairs; recall ≥ 95% at τ=0.8 with 64 perms."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs_with_dups, threshold=0.8).collect()
    }
    assert lsh <= exact  # verification makes false positives impossible
    assert len(lsh) >= 0.95 * len(exact), (len(lsh), len(exact))


def test_minhash_dedup_removes_near_dups(docs_with_dups):
    kept = dedup.minhash_dedup(docs_with_dups, threshold=0.8)
    # all 10000-range near-copies drop (their source has a lower id);
    # 20000-range exact copies also near-dup their source
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not any(i + 10000 in ids for i in range(30))
    # originals survive unless they genuinely near-dup a lower-id fixture
    # doc (the synthetic corpus does contain a few such pairs)
    genuine_losers = {
        r["id_b"]
        for r in dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.8).collect()
    }
    assert all(i in ids for i in range(30) if i not in genuine_losers)


def test_simhash_deterministic_and_sensitive(spark, docs):
    two = docs.filter(F.col("doc_id") < 2).select(
        "doc_id", dedup.simhash("text").alias("s")
    )
    a = {r["doc_id"]: r["s"] for r in two.collect()}
    b = {r["doc_id"]: r["s"] for r in two.collect()}
    assert a == b  # deterministic
    assert a[0] != a[1]  # different docs → different signatures


def test_simhash_pairs_near_dups(spark, docs):
    # a copy with one appended token differs in few bits → hamming small
    near = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" q")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    u = docs.filter(F.col("doc_id") < 50).unionByName(near)
    pairs = dedup.simhash_pairs(u, max_hamming=12, bands=4)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    hits = sum((i, i + 10000) in found for i in range(10))
    assert hits >= 8, found  # pigeonhole bands catch ≤12-bit differences


def test_embedding_dup_pairs_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # union a jittered copy: scaling a vector leaves cosine == 1
    copy = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    u = emb.filter(F.col("vec_id") < 100).unionByName(copy)
    pairs = dedup.embedding_dup_pairs(u, threshold=0.999)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 10000) for i in range(5)} <= found
