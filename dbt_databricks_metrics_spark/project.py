"""The reference dbt project, re-expressed on the engine.

Every model/metric-view below mirrors one reference artifact:

* ``stg_orders``  ≡ ``models/staging/stg_orders.sql`` (rename projection;
  fixture lacks ``o_clerk``/``o_shippriority``/``o_comment`` — see
  FIXTURES.md — so only the metric-relevant columns are selected).
* ``stg_customers`` ≡ ``models/staging/stg_customers.sql``.
* ``fct_orders`` ≡ ``models/marts/fct_orders.sql`` (left join + date parts).
* ``fct_customer_summary`` ≡ ``models/marts/fct_customer_summary.sql``.
* metric-view YAML blocks ≡ ``models/schema.yml`` ``meta.metric_view``
  entries (raw-YAML mode, ``__SOURCE__`` placeholder).

The staging casts ``o_orderdate`` (fixture: timestamp) to ``date``, matching
TPC-H's DATE column that the reference models consume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .models import ModelRegistry

# ---- metric-view YAML (≡ models/schema.yml:6-209) -----------------------

MV_ORDERS_SIMPLE_YAML = """
version: 0.1
source: __SOURCE__

dimensions:
  - name: order_status
    expr: order_status
  - name: order_priority
    expr: order_priority
  - name: order_date
    expr: order_date

measures:
  - name: order_count
    expr: count(*)
  - name: total_revenue
    expr: sum(total_price)
  - name: avg_order_value
    expr: avg(total_price)

materialization:
  schedule: every 8 weeks
  mode: relaxed
  materialized_views:
    - name: baseline
      type: unaggregated
    - name: orders_by_status
      type: aggregated
      dimensions:
        - order_status
      measures:
        - order_count
        - total_revenue
"""

MV_ORDER_METRICS_YAML = """
version: 0.1
source: __SOURCE__

dimensions:
  - name: market_segment
    expr: market_segment
  - name: order_status
    expr: order_status
  - name: order_priority
    expr: order_priority
  - name: order_date
    expr: order_date
  - name: order_year
    expr: order_year
  - name: order_month
    expr: order_month

measures:
  - name: total_orders
    expr: count(*)
  - name: total_revenue
    expr: sum(total_price)
  - name: avg_order_value
    expr: avg(total_price)
  - name: max_order_value
    expr: max(total_price)
  - name: distinct_customers
    expr: count(distinct customer_id)
  - name: median_order_value
    expr: median(total_price)
  - name: trailing_7d_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: trailing 7 day
        semiadditive: last
  - name: cumulative_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: cumulative
        semiadditive: last

materialization:
  schedule: every 6 hours
  mode: relaxed
  materialized_views:
    - name: baseline
      type: unaggregated
    - name: revenue_by_segment
      type: aggregated
      dimensions:
        - market_segment
        - order_status
      measures:
        - total_revenue
        - total_orders
    - name: monthly_revenue
      type: aggregated
      dimensions:
        - order_year
        - order_month
      measures:
        - total_revenue
    # daily grain: serves plain (segment × day) queries AND the grain of
    # the window measures (trailing/cumulative sum(total_price) grouped by
    # market_segment) via WindowGrainProvider — the window sort then reads
    # |segments × days| rollup rows instead of rescanning the fact
    - name: daily_revenue
      type: aggregated
      dimensions:
        - market_segment
        - order_date
      measures:
        - total_revenue
        - total_orders
"""

MV_CUSTOMER_METRICS_YAML = """
version: 1.1
source: __SOURCE__

dimensions:
  - name: market_segment
    expr: market_segment
    display_name: "Market Segment"
    comment: "Customer market segment classification"
    synonyms:
      - "segment"
      - "business segment"
      - "customer type"

measures:
  - name: total_customers
    expr: count(*)
    display_name: "Total Customers"
    comment: "Count of unique customers"
    synonyms:
      - "customer count"
      - "number of customers"
  - name: total_revenue
    expr: sum(total_spent)
    display_name: "Total Revenue"
    comment: "Sum of all customer spending"
    synonyms:
      - "revenue"
      - "total sales"
    format:
      type: currency
      currency_code: USD
  - name: avg_customer_value
    expr: avg(total_spent)
    display_name: "Average Customer Lifetime Value"
    synonyms:
      - "CLV"
      - "customer value"
      - "ARPU"
    format:
      type: currency
      currency_code: USD
  - name: avg_orders_per_customer
    expr: avg(total_orders)
    display_name: "Average Orders per Customer"
  - name: high_value_customers
    expr: count_if(total_spent > 100000)
    display_name: "High Value Customers"
    comment: "Count of customers with total spending over $100,000"
  - name: avg_order_frequency
    expr: avg(total_orders / nullif(datediff(last_order_date, first_order_date), 0))
    display_name: "Average Order Frequency"
    comment: "Average orders per day between first and last order"
"""

# Big-fact surface beyond the reference's own 4 models: the reference runs on
# `samples.tpch` (README.md:452) where LINEITEM is the dominant fact. These
# views exercise the same spec grammar (dims/measures/filter/joins,
# README.md:143-353) on the largest fixture table — the 100 TB posture.

MV_LINEITEM_PRICING_YAML = """
version: 0.1
source: __SOURCE__
filter: ship_date <= date '2001-09-02'

dimensions:
  - name: return_flag
    expr: return_flag
  - name: line_status
    expr: line_status
  - name: ship_date
    expr: ship_date
  - name: ship_year
    expr: year(ship_date)
  - name: ship_month
    expr: month(ship_date)

measures:
  - name: sum_qty
    expr: sum(quantity)
  - name: sum_base_price
    expr: sum(extended_price)
  - name: sum_disc_price
    expr: sum(extended_price * (1 - discount))
  - name: sum_charge
    expr: sum(extended_price * (1 - discount) * (1 + tax))
  - name: avg_qty
    expr: avg(quantity)
  - name: avg_price
    expr: avg(extended_price)
  - name: avg_disc
    expr: avg(discount)
  - name: count_order
    expr: count(*)

materialization:
  schedule: every 6 hours
  mode: relaxed
  materialized_views:
    - name: pricing_by_flag_status
      type: aggregated
      dimensions:
        - return_flag
        - line_status
      measures:
        - sum_qty
        - sum_base_price
        - sum_disc_price
        - sum_charge
        - avg_qty
        - avg_price
        - avg_disc
        - count_order
    - name: pricing_monthly
      type: aggregated
      dimensions:
        - ship_year
        - ship_month
      measures:
        - sum_disc_price
        - count_order
"""

# Snowflake star over the big fact: lineitem → orders → customer → nation →
# region, declared with the `joins:` grammar (README.md:282-300, nested form
# README.md:290-299). Dimension paths flatten to the leaf alias. At scale:
# orders joins shuffle-on-key; customer/nation/region are broadcast dims.
MV_SALES_STAR_YAML = """
version: 0.1
source: __SOURCE__

joins:
  - name: orders
    source: stg_orders
    on: source.order_id = orders.order_id
    joins:
      - name: customer
        source: stg_customers
        on: orders.customer_id = customer.customer_id
        joins:
          - name: nation
            source: dim_nation
            on: customer.nation_id = nation.nation_id
            joins:
              - name: region
                source: dim_region
                on: nation.region_id = region.region_id
  - name: part
    source: stg_part
    on: source.part_id = part.part_id
  - name: supplier
    source: stg_supplier
    on: source.supplier_id = supplier.supplier_id

dimensions:
  - name: nation_name
    expr: orders.customer.nation.nation_name
  - name: region_name
    expr: orders.customer.nation.region.region_name
  - name: market_segment
    expr: orders.customer.market_segment
  - name: order_year
    expr: year(orders.order_date)
  - name: return_flag
    expr: return_flag
  - name: part_brand
    expr: part.brand
  - name: part_type
    expr: part.part_type
  - name: supplier_name
    expr: supplier.supplier_name

measures:
  - name: revenue
    expr: sum(extended_price * (1 - discount))
  - name: line_count
    expr: count(*)
  - name: avg_discount
    expr: avg(discount)
  - name: retail_value
    expr: sum(quantity * part.retail_price)
"""


def build_registry(sf_dir: str) -> ModelRegistry:
    """Model DAG over the fixture tables at *sf_dir*."""
    reg = ModelRegistry()

    def read(spark: SparkSession, name: str) -> DataFrame:
        from .sources.fixtures import perturb_layout

        return perturb_layout(
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        )

    @reg.model(
        "stg_orders",
        materialized="view",
        description="Staging layer for TPC-H orders data",
        meta={
            "checks": [
                {"not_null": "order_id"},
                {"unique": "order_id"},
                {"accepted_values": {"column": "order_status", "values": ["F", "O", "P"]}},
                {"expression": "total_price >= 0"},
            ],
            # dbt model contract (contract: enforced) — the staging
            # interface every mart builds on; wrong shape fails the build
            "contract": {
                "columns": [
                    {"name": "order_id", "data_type": "bigint"},
                    {"name": "customer_id", "data_type": "bigint"},
                    {"name": "order_status", "data_type": "string"},
                    {"name": "total_price", "data_type": "double"},
                    {"name": "order_date", "data_type": "date"},
                    {"name": "order_priority", "data_type": "string"},
                ]
            },
            "metric_view": {
                "enabled": True,
                "name": "mv_orders_simple",
                "description": "Simple metric view with long schedule (manual refresh preferred)",
                "yaml": MV_ORDERS_SIMPLE_YAML,
            }
        },
    )
    def stg_orders(spark: SparkSession, ref) -> DataFrame:
        # ≡ models/staging/stg_orders.sql:10-20 (available columns only)
        return read(spark, "orders").select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_totalprice").alias("total_price"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )

    @reg.model(
        "stg_customers",
        materialized="view",
        description="Staging layer for TPC-H customer data",
    )
    def stg_customers(spark: SparkSession, ref) -> DataFrame:
        # ≡ models/staging/stg_customers.sql:10-19 (available columns only)
        return read(spark, "customer").select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_nationkey").alias("nation_id"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("c_mktsegment").alias("market_segment"),
        )

    @reg.model(
        "fct_orders",
        deps=["stg_orders", "stg_customers"],
        materialized="table",
        # partition the mart by year so date-constrained queries prune
        # whole partitions at the parquet scan (100 TB posture; SURVEY §4)
        partition_by=("order_year",),
        description="Fact table with order details and customer information",
        meta={
            "checks": [
                {"not_null": "order_id"},
                {"unique": "order_id"},
                {"relationships": {"column": "customer_id", "to": "stg_customers", "field": "customer_id"}},
            ],
            "metric_view": {
                "enabled": True,
                "name": "mv_order_metrics",
                "description": "Order KPIs and metrics for business analysis",
                "yaml": MV_ORDER_METRICS_YAML,
            }
        },
    )
    def fct_orders(spark: SparkSession, ref) -> DataFrame:
        # ≡ models/marts/fct_orders.sql:10-24
        o = ref("stg_orders").alias("o")
        c = ref("stg_customers").alias("c")
        return o.join(c, F.col("o.customer_id") == F.col("c.customer_id"), "left").select(
            F.col("o.order_id").alias("order_id"),
            F.col("o.customer_id").alias("customer_id"),
            F.col("c.customer_name").alias("customer_name"),
            F.col("c.market_segment").alias("market_segment"),
            F.col("o.order_status").alias("order_status"),
            F.col("o.total_price").alias("total_price"),
            F.col("o.order_date").alias("order_date"),
            F.col("o.order_priority").alias("order_priority"),
            F.year("o.order_date").alias("order_year"),
            F.month("o.order_date").alias("order_month"),
            F.quarter("o.order_date").alias("order_quarter"),
        )

    @reg.model(
        "fct_customer_summary",
        deps=["stg_customers", "stg_orders"],
        materialized="table",
        description="Customer summary with aggregated order metrics",
        meta={
            "metric_view": {
                "enabled": True,
                "name": "mv_customer_metrics",
                "description": "Customer KPIs for segmentation and analysis",
                "yaml": MV_CUSTOMER_METRICS_YAML,
            }
        },
    )
    def fct_customer_summary(spark: SparkSession, ref) -> DataFrame:
        # ≡ models/marts/fct_customer_summary.sql:10-23 — left join keeps
        # zero-order customers (count=0, sum/avg/min/max NULL)
        c = ref("stg_customers").alias("c")
        o = ref("stg_orders").alias("o")
        return (
            c.join(o, F.col("c.customer_id") == F.col("o.customer_id"), "left")
            .groupBy(
                F.col("c.customer_id").alias("customer_id"),
                F.col("c.customer_name").alias("customer_name"),
                F.col("c.market_segment").alias("market_segment"),
                F.col("c.account_balance").alias("account_balance"),
            )
            .agg(
                F.count("o.order_id").alias("total_orders"),
                F.sum("o.total_price").alias("total_spent"),
                F.avg("o.total_price").alias("avg_order_value"),
                F.min("o.order_date").alias("first_order_date"),
                F.max("o.order_date").alias("last_order_date"),
            )
        )

    @reg.model(
        "stg_lineitem",
        materialized="view",
        description="Staging layer for TPC-H lineitem (the dominant fact)",
        meta={
            "checks": [
                {"not_null": "order_id"},
                {"accepted_values": {"column": "return_flag", "values": ["A", "N", "R"]}},
                {"expression": "quantity > 0 AND discount BETWEEN 0 AND 1"},
            ],
            "metric_view": {
                "enabled": True,
                "name": "mv_lineitem_pricing",
                "description": "TPC-H Q1-style pricing summary over the big fact",
                "yaml": MV_LINEITEM_PRICING_YAML,
            },
        },
    )
    def stg_lineitem(spark: SparkSession, ref) -> DataFrame:
        # same staging discipline as stg_orders: raw l_* names appear only here
        return read(spark, "lineitem").select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("part_id"),
            F.col("l_suppkey").alias("supplier_id"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )

    @reg.model(
        "dim_nation",
        materialized="view",
        description="Nation dimension (broadcast-sized)",
        meta={
            "metric_view": {
                "enabled": True,
                "name": "mv_sales_star",
                "description": "Snowflake star: lineitem x orders x customer x nation x region",
                "yaml": MV_SALES_STAR_YAML,
                # star MV reads stg_lineitem as its source, not this model;
                # attach here only so registration happens after dims exist
                "source": "stg_lineitem",
            },
        },
    )
    def dim_nation(spark: SparkSession, ref) -> DataFrame:
        return read(spark, "nation").select(
            F.col("n_nationkey").alias("nation_id"),
            F.col("n_name").alias("nation_name"),
            F.col("n_regionkey").alias("region_id"),
        )

    @reg.model(
        "dim_region",
        materialized="view",
        description="Region dimension (broadcast-sized)",
    )
    def dim_region(spark: SparkSession, ref) -> DataFrame:
        return read(spark, "region").select(
            F.col("r_regionkey").alias("region_id"),
            F.col("r_name").alias("region_name"),
        )

    @reg.model(
        "stg_part",
        materialized="view",
        description="Part dimension (broadcast-sized)",
    )
    def stg_part(spark: SparkSession, ref) -> DataFrame:
        return read(spark, "part").select(
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("part_size"),
            F.col("p_retailprice").alias("retail_price"),
        )

    @reg.model(
        "stg_supplier",
        materialized="view",
        description="Supplier dimension (broadcast-sized)",
    )
    def stg_supplier(spark: SparkSession, ref) -> DataFrame:
        return read(spark, "supplier").select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            F.col("s_nationkey").alias("supplier_nation_id"),
            F.col("s_acctbal").alias("supplier_balance"),
        )

    return reg
