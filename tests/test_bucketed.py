"""Bucketed table materialization: co-located fact-to-fact joins.

At 100 TB the lineitem⋈orders join is the dominant shuffle; hash-bucketing
both marts on the join key at write time makes the join shuffle-free on
every subsequent query (the bucket layout is the exchange, paid once).
This is the Spark-native equivalent of the warehouse-side clustering the
reference delegates to Databricks (SURVEY §4: partition pruning / file
skipping row).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.models import ModelError, ModelRegistry, Runner

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    reg = ModelRegistry()

    @reg.model("bkt_orders", materialized="table", bucket_by=(8, ["order_id"]),
               sort_by=["order_id"])
    def bkt_orders(spark_, ref):
        return spark_.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_totalprice").alias("total_price"),
        )

    @reg.model("bkt_lineitem", materialized="table", bucket_by=(8, ["order_id"]),
               sort_by=["order_id"])
    def bkt_lineitem(spark_, ref):
        return spark_.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_extendedprice").alias("extended_price"),
            F.col("l_discount").alias("discount"),
        )

    runner = Runner(spark, reg, warehouse_dir=str(tmp_path_factory.mktemp("bkt")))
    return runner.run()


def test_bucketed_join_is_shuffle_free(bucketed):
    li, od = bucketed["bkt_lineitem"], bucketed["bkt_orders"]
    joined = li.hint("merge").join(od, "order_id")
    agg = joined.groupBy("order_status").agg(
        F.sum(F.col("extended_price") * (1 - F.col("discount"))).alias("revenue")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    # the only exchange is the final groupBy — the join itself reads
    # co-located buckets from both sides
    assert plan.count("Exchange") == 1, plan[:2000]


def test_bucketed_join_matches_oracle(bucketed, duck):
    li, od = bucketed["bkt_lineitem"], bucketed["bkt_orders"]
    agg = (
        li.hint("merge")
        .join(od, "order_id")
        .groupBy("order_status")
        .agg(
            F.sum(F.col("extended_price") * (1 - F.col("discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )
    assert_df_matches_oracle(
        agg,
        duck,
        """
        SELECT o.o_orderstatus AS order_status,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               count(*) AS line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        """,
    )


def test_bucket_by_requires_table(spark):
    reg = ModelRegistry()
    with pytest.raises(ModelError, match="bucket_by requires"):
        @reg.model("bad", materialized="view", bucket_by=(4, ["x"]))
        def bad(spark_, ref):
            raise AssertionError("never built")
