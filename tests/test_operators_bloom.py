from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.operators import bloom
from dbt_databricks_metrics_spark.sources import load_table

M, K = 4096, 3


@pytest.fixture(scope="module")
def dim(spark, sf_dir):
    return load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)


@pytest.fixture(scope="module")
def fact(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_words_table_bounded(spark, dim):
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    rows = words.collect()
    assert 0 < len(rows) <= M // 32
    assert all(0 <= r["word_idx"] < M // 32 for r in rows)
    assert all(r["word"] >= 0 for r in rows)  # 32-bit packing: no sign bit


def test_no_false_negatives(spark, dim):
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    probed = bloom.with_bloom_member(
        dim.select("p_partkey"), "p_partkey", words, M, K
    )
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_fp_rate_near_textbook(spark, dim, fact):
    n = dim.select("p_partkey").distinct().count()
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    probe_keys = fact.select(F.col("l_partkey").alias("k")).distinct()
    member_keys = probe_keys.join(
        dim.select(F.col("p_partkey").alias("k")).distinct(), "k", "left_anti"
    )
    probed = bloom.with_bloom_member(member_keys, "k", words, M, K)
    total = member_keys.count()
    fps = probed.filter(F.col("bloom_member")).count()
    expected = (1.0 - math.exp(-K * n / M)) ** K
    # textbook rate with generous slack on a small sample
    assert fps / max(total, 1) <= max(4 * expected, 0.05)


def test_semi_join_exact(spark, dim, fact):
    got = bloom.bloom_semi_join(fact, "l_partkey", dim, "p_partkey", M, K)
    want = fact.join(
        dim.select(F.col("p_partkey").alias("l_partkey")).distinct(),
        "l_partkey",
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.select(F.sum("l_quantity")).first()[0] == pytest.approx(
        want.select(F.sum("l_quantity")).first()[0]
    )


def test_member_matches_duckdb(spark, dim, duck):
    """The membership booleans reproduce bit-for-bit in DuckDB."""
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    probed = (
        bloom.with_bloom_member(
            dim.sparkSession.range(1, 300).select(
                F.col("id").alias("k")
            ),
            "k",
            words,
            M,
            K,
        )
        .orderBy("k")
        .collect()
    )
    hashes = ",".join(
        f"CAST('0x'||substr(md5(CAST(k AS VARCHAR) || '#{i}'),1,15) AS BIGINT)"
        f" % {M} AS p{i}"
        for i in range(K)
    )
    tests = " AND ".join(
        f"(coalesce(w{i}.word, CAST(0 AS BIGINT)) &"
        f" (CAST(1 AS BIGINT) << CAST(p.p{i} % 32 AS INTEGER))) <> 0"
        for i in range(K)
    )
    joins = " ".join(
        f"LEFT JOIN words w{i} ON w{i}.word_idx = p.p{i} // 32"
        for i in range(K)
    )
    sql = f"""
    WITH keys AS (SELECT DISTINCT p_partkey AS key FROM part WHERE p_size <= 5),
    pos AS (
      SELECT CAST('0x'||substr(md5(CAST(key AS VARCHAR) || '#' ||
                 CAST(i.i AS VARCHAR)),1,15) AS BIGINT) % {M} AS pos
      FROM keys CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2) i
    ),
    words AS (
      SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
      FROM pos GROUP BY 1
    ),
    p AS (SELECT k, {hashes} FROM (SELECT range AS k FROM range(1, 300)) t)
    SELECT p.k, ({tests}) AS member FROM p {joins} ORDER BY p.k
    """
    want = duck.execute(sql).fetchall()
    got = [(r["k"], r["bloom_member"]) for r in probed]
    assert got == [(k, bool(m)) for k, m in want]


def test_m_bits_validated(spark, dim):
    with pytest.raises(ValueError):
        bloom.bloom_build(dim, "p_partkey", m_bits=100)


def test_scratch_column_collision_raises(spark, dim):
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    bad = dim.select("p_partkey", F.lit(1).alias("_bw0"))
    with pytest.raises(ValueError, match="collide"):
        bloom.with_bloom_member(bad, "p_partkey", words, M, K)


def test_null_keys_dropped_by_semi_join(spark, dim):
    fact = dim.sparkSession.createDataFrame(
        [(None,), (1,)], "l_partkey bigint"
    )
    got = bloom.bloom_semi_join(fact, "l_partkey", dim, "p_partkey", M, K)
    assert got.filter(F.col("l_partkey").isNull()).count() == 0


def test_hash_fn_validated(spark, dim):
    with pytest.raises(ValueError, match="hash_fn"):
        bloom.bloom_build(dim, "p_partkey", M, K, hash_fn="sha1")


def test_xxhash_path_semi_join_exact(spark, dim, fact):
    got = bloom.bloom_semi_join(
        fact, "l_partkey", dim, "p_partkey", M, K, hash_fn="xxhash64"
    )
    want = fact.join(
        dim.select(F.col("p_partkey").alias("l_partkey")).distinct(),
        "l_partkey",
        "left_semi",
    )
    assert got.count() == want.count()


def test_build_plan_quality(spark, dim):
    # the probe-side gate (test_plan_gates_ext) can't see the build side
    # past bloom_build_local's eager cache — gate the build plan here
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_member_col_collision_raises(spark, dim):
    words = bloom.bloom_build(dim, "p_partkey", M, K)
    with pytest.raises(ValueError, match="collide"):
        bloom.with_bloom_member(
            dim.select("p_partkey"), "p_partkey", words, M, K,
            member_col="_wv1",
        )
    with pytest.raises(ValueError, match="collide"):
        bloom.with_bloom_member(
            dim.select("p_partkey", F.lit(1).alias("flag")),
            "p_partkey", words, M, K, member_col="flag",
        )


def test_n_hashes_validated(spark, dim):
    with pytest.raises(ValueError, match="n_hashes"):
        bloom.bloom_build(dim, "p_partkey", M, n_hashes=0)


def test_bloom_pin_registry_bounds_cached_bitsets(spark):
    """r9 (ADVICE r8): bloom_build_local pins at most _PINNED_CAP bitsets;
    older ones are unpersisted automatically, bloom_release drops the
    rest, and an evicted bitset stays USABLE (lineage recompute)."""
    from dbt_databricks_metrics_spark.operators import bloom as B

    B.bloom_release()  # clean slate
    # distinct plans per build — Spark's cache manager keys entries on
    # the analyzed plan, so same-plan bitsets would share ONE entry
    built = [
        B.bloom_build_local(
            spark.range(0, 50 + i).selectExpr("CAST(id AS STRING) AS k"),
            "k", m_bits=1 << 10, n_hashes=2,
        )
        for i in range(B._PINNED_CAP + 3)
    ]
    assert len(B._pinned) == B._PINNED_CAP
    # the oldest were evicted and unpersisted...
    assert built[0].storageLevel.useMemory is False
    # ...but remain correct via lineage
    assert built[0].count() > 0
    # the newest are still cached
    assert built[-1].storageLevel.useMemory is True
    B.bloom_release(built[-1])
    assert built[-1].storageLevel.useMemory is False
    B.bloom_release()
    assert not B._pinned


def test_bloom_pin_dedupes_same_plan_builds(spark):
    """Review r9: Spark's cache manager keys on the analyzed plan, so two
    builds from the same inputs share ONE cache entry — the registry must
    keep a single handle for them (evicting the older handle would
    silently uncache the 'newer' pinned bitset)."""
    from dbt_databricks_metrics_spark.operators import bloom as B

    B.bloom_release()
    dim = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS k")
    w1 = B.bloom_build_local(dim, "k", m_bits=1 << 10, n_hashes=2)
    w2 = B.bloom_build_local(dim, "k", m_bits=1 << 10, n_hashes=2)
    assert w1.sameSemantics(w2)
    assert len(B._pinned) == 1  # one handle for the shared cache entry
    # filling the registry past cap must NOT uncache the shared entry
    # through a stale duplicate handle
    for i in range(B._PINNED_CAP):
        B.bloom_build_local(
            spark.range(0, 41 + i).selectExpr("CAST(id AS STRING) AS k"),
            "k", m_bits=1 << 10, n_hashes=2,
        )
    assert w2.storageLevel.useMemory is False  # evicted once, as ONE entry
    assert w2.count() > 0  # still correct via lineage
    B.bloom_release()


def test_bloom_release_matches_by_semantics(spark):
    """ADVICE r9 #3: releasing a bitset through a semantically-equal but
    DIFFERENT handle object (the _pin dedupe case keeps only the first
    handle) must also pop the registry entry — otherwise the FIFO cap
    tracks a handle whose cache entry the release just dropped."""
    from dbt_databricks_metrics_spark.operators import bloom as B

    B.bloom_release()
    dim = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS k")
    w1 = B.bloom_build_local(dim, "k", m_bits=1 << 10, n_hashes=2)
    w2 = B.bloom_build_local(dim, "k", m_bits=1 << 10, n_hashes=2)
    assert len(B._pinned) == 1 and id(w2) in B._pinned  # w2 is the handle
    B.bloom_release(w1)  # release via the OTHER (deduped-away) handle
    assert not B._pinned, "registry kept a dead entry after release"
    assert w2.storageLevel.useMemory is False
    assert w2.count() > 0  # lineage recompute still correct
    B.bloom_release()
