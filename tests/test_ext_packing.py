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
