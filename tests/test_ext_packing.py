"""Sequence packing ([EXT]): bin-fill guarantees, determinism, and the
windowed-cumsum oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import packing
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_fill_guarantee_and_coverage(docs):
    budget = 256
    stats = packing.bin_stats(docs, budget).cache()
    packed = packing.pack_bins(docs, budget)
    # every doc assigned exactly one bin
    assert packed.count() == docs.count()
    rows = stats.collect()
    max_doc = packed.agg(F.max("n_tokens")).first()[0]
    # contiguous packing: each non-last bin covers exactly `budget` of
    # cumulative-token range, so its own fill deviates from the budget by
    # less than one document (spill-in/spill-out at the boundaries)
    last = {
        (r["lang"]): r["m"]
        for r in stats.groupBy("lang").agg(F.max("bin_id").alias("m")).collect()
    }
    for r in rows:
        assert r.total_tokens < budget + max_doc, r
        if r.bin_id < last[r.lang]:
            assert r.total_tokens > budget - max_doc, r


def test_deterministic_across_partitioning(docs):
    a = sorted(map(tuple, packing.pack_bins(docs, 512).select("doc_id", "bin_id").collect()))
    b = sorted(
        map(tuple, packing.pack_bins(docs.repartition(17), 512).select("doc_id", "bin_id").collect())
    )
    assert a == b


def test_oversize_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 500, "en"), (2, "x " * 10, "en"), (3, "y " * 10, "en")],
        "doc_id long, text string, lang string",
    )
    packed = {r.doc_id: r.bin_id for r in packing.pack_bins(docs, 100).collect()}
    # doc 1 (500 tokens) occupies bins 0-4's worth alone; the small docs
    # start at the next bin boundary after it
    assert packed[1] == 0
    assert packed[2] == packed[3] == 5


def test_vs_duck_oracle(docs, duck):
    out = packing.pack_bins(docs, 512).select("doc_id", "lang", "n_tokens", "bin_id")
    assert_df_matches_oracle(
        out,
        duck,
        r"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                        END AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               CAST(floor((sum(n_tokens) OVER (
                       PARTITION BY lang
                       ORDER BY n_tokens DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens) / 512)
                   AS BIGINT) AS bin_id
        FROM toks
        """,
    )


def test_packing_single_shuffle(docs):
    """One window cumsum = exactly one exchange (on the partition group)."""
    df = packing.pack_bins(docs, 512)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2000]


def test_pack_token_stream_hand_computed(spark):
    from dbt_databricks_metrics_spark.ext.packing import pack_token_stream

    # single shard (n_shards=1): docs concatenate in id order
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, ""), (4, "h i")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["start_tok"], r["end_tok"], r["first_seq"], r["last_seq"])
        for r in pack_token_stream(docs, seq_len=4, n_shards=1).collect()
    }
    assert got[1] == (0, 3, 0, 0)        # tokens 0-2 -> seq 0
    assert got[2] == (3, 7, 0, 1)        # spans the seq-0/seq-1 boundary
    assert got[3] == (7, 7, 1, 1)        # zero tokens, no stream space
    assert got[4] == (7, 9, 1, 2)        # spans seq 1 -> 2


def test_pack_token_stream_shard_streams_independent(spark):
    from dbt_databricks_metrics_spark.ext.packing import (
        assign_shards,
        pack_token_stream,
    )
    from dbt_databricks_metrics_spark.sources import load_table
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    out = pack_token_stream(docs, seq_len=128, n_shards=4)
    # per shard: offsets tile the stream exactly (sum of lengths == max end)
    import pyspark.sql.functions as F

    per = out.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("s"), F.max("end_tok").alias("e")
    ).collect()
    assert per and all(r["s"] == r["e"] for r in per)
    assert out.filter(F.col("last_seq") < F.col("first_seq")).count() == 0


def test_pack_token_stream_bad_args(spark):
    from dbt_databricks_metrics_spark.ext.packing import pack_token_stream

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="seq_len"):
        pack_token_stream(docs, seq_len=0)
