"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`pipeline` is the full `dbt run`-equivalent (2 staging + 2 marts + 3 metric
views + rollup build). Routed vs live segment queries demonstrate the
rollup router speedup (BASELINE.md target: >=10x on covered dims).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import tempfile

    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.plans.compiler import MetricQuery
    from dbt_databricks_metrics_spark.project import build_registry
    from dbt_databricks_metrics_spark.session import get_spark
    from dbt_databricks_metrics_spark.specs import MetricViewSpec

    spark = get_spark("bench")
    timings: dict[str, float] = {}

    def timed(name: str, fn, warm: bool = False):
        if warm:
            fn()  # steady-state: measure the second run
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    # warm the JVM/parquet footprint outside the timings
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=tempfile.mkdtemp(prefix="bench_wh_")
    )
    timed("pipeline", lambda: eng.run(materialize_rollups=True))

    from __spark_entry__ import YTD_SPEC_YAML

    eng.register(MetricViewSpec.from_yaml(YTD_SPEC_YAML, name="mv_ytd"))

    mv = eng.metric_view("mv_order_metrics")

    def routed():
        df, route = mv.query_routed(["market_segment"], ["total_revenue", "total_orders"])
        assert route == "rollup:revenue_by_segment", route
        return df.collect()

    def live():
        q = MetricQuery(mv.spec, ("market_segment",), ("total_revenue", "total_orders"))
        return eng._compiler.compile(q).collect()

    timed("q_segment_routed", routed, warm=True)
    timed("q_segment_live", live, warm=True)
    timed(
        "q_monthly_routed",
        lambda: mv.query(["order_year", "order_month"], ["total_revenue"]).collect(),
    )
    timed(
        "q_trailing_7d",
        lambda: mv.query(["market_segment"], ["trailing_7d_revenue"]).collect(),
    )
    timed(
        "q_mixed_plain_window",
        lambda: mv.query(
            ["market_segment"], ["total_revenue", "trailing_7d_revenue"]
        ).collect(),
    )
    timed(
        "q_ytd",
        lambda: eng.metric_view("mv_ytd")
        .query(["market_segment"], ["ytd_revenue"])
        .collect(),
    )
    timed(
        "q_customer_metrics",
        lambda: eng.metric_view("mv_customer_metrics")
        .query(
            ["market_segment"],
            [
                "total_customers",
                "total_revenue",
                "avg_customer_value",
                "high_value_customers",
                "avg_order_frequency",
            ],
        )
        .collect(),
    )

    # scale-invariant routing evidence: rows scanned by each plan (at sf0.1
    # both queries are scheduling-bound ~0.2s; the scan ratio is what
    # predicts the 10-100x at warehouse scale, README.md:424-429)
    state = eng.catalog.get("mv_order_metrics").state
    routed_rows = spark.read.parquet(state.rollups["revenue_by_segment"].path).count()
    live_rows = eng.ref("fct_orders").count()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "pipeline_plus_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "routed_speedup": round(
                    timings["q_segment_live"] / max(timings["q_segment_routed"], 1e-9), 2
                ),
                "routed_rows_scanned": routed_rows,
                "live_rows_scanned": live_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
