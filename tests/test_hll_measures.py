"""Routable distinct counts via DataSketches HLL partials.

Exact ``count(distinct x)`` never routes through rollups (not
decomposable — ``functions/aggregates.py``), matching the reference's
warehouse behavior. A ``hll_sketch_estimate(hll_sketch_agg(x))`` measure
DOES route: the rollup stores per-cell binary sketches, re-aggregation is
``hll_union_agg`` (register-wise max — associative and lossless at equal
lgConfigK), so routed ≡ live holds *exactly*, not approximately. The same
mergeability powers incremental refresh folds and windowed distinct
counts (trailing-N-day distinct users) from a per-day grain.

No DuckDB oracle exists for these (different sketch implementations) —
the correctness story is (a) routed/folded/direct estimates are
bit-identical, (b) estimates sit within sketch error of the exact
distinct count computed by Spark itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec
from dbt_databricks_metrics_spark.streaming.refresh import fold_increment

SPEC = """
version: 0.1
source: fct_orders
dimensions:
  - name: market_segment
    expr: market_segment
  - name: order_status
    expr: order_status
  - name: order_date
    expr: order_date
measures:
  - name: distinct_customers
    expr: hll_sketch_estimate(hll_sketch_agg(customer_id))
  - name: exact_customers
    expr: count(distinct customer_id)
  - name: trailing_7d_customers
    expr: hll_sketch_estimate(hll_sketch_agg(customer_id))
    window:
      - order: order_date
        range: trailing 7 day
        semiadditive: last
materialization:
  materialized_views:
    - name: sketch_by_seg_status
      type: aggregated
      dimensions: [market_segment, order_status]
      measures: [distinct_customers]
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("wh_hll")),
    )
    eng.run()
    eng.register(MetricViewSpec.from_yaml(SPEC, name="mv_sketch"))
    eng.refresh("mv_sketch")
    return eng


def _by_key(df, dims, val):
    return {tuple(r[d] for d in dims): r[val] for r in df.collect()}


def test_sketch_measure_routes(engine):
    mv = engine.metric_view("mv_sketch")
    _, route = mv.query_routed(["market_segment"], ["distinct_customers"])
    assert route == "rollup:sketch_by_seg_status"
    # the exact-distinct measure must NOT route (non-decomposable)
    _, route = mv.query_routed(["market_segment"], ["exact_customers"])
    assert route in ("baseline", "live")


def test_routed_estimate_equals_live_exactly(engine):
    """Union of per-cell sketches ≡ direct sketch — bit-identical estimate."""
    mv = engine.metric_view("mv_sketch")
    for dims in (["market_segment"], ["market_segment", "order_status"], []):
        live = mv.query(dimensions=dims, measures=["distinct_customers"])
        routed, route = mv.query_routed(dims, ["distinct_customers"])
        assert route.startswith("rollup:")
        assert _by_key(live, dims, "distinct_customers") == _by_key(
            routed, dims, "distinct_customers"
        )


def test_estimate_within_sketch_error_of_exact(engine):
    mv = engine.metric_view("mv_sketch")
    df = mv.query(
        dimensions=["market_segment"],
        measures=["distinct_customers", "exact_customers"],
    )
    for r in df.collect():
        assert r["exact_customers"] > 0
        rel = abs(r["distinct_customers"] - r["exact_customers"]) / r["exact_customers"]
        assert rel < 0.03, (r["market_segment"], rel)


def test_union_identical_to_direct_at_dense_cardinality(spark):
    """Beyond sparse mode (~200k distinct) the merged estimate still equals
    the directly-built sketch's — the property routing correctness rests on."""
    df = spark.range(0, 200_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 32).alias("sub"), F.col("id")
    )
    direct = _by_key(
        df.groupBy("g").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
        ),
        ["g"],
        "est",
    )
    merged = _by_key(
        df.groupBy("g", "sub")
        .agg(F.hll_sketch_agg("id").alias("sk"))
        .groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")),
        ["g"],
        "est",
    )
    assert direct == merged
    for (g,), est in direct.items():
        assert abs(est - 50_000) / 50_000 < 0.05


def test_incremental_fold_preserves_sketch(engine, spark):
    """rollup(S ∪ ΔS) = merge(rollup(S), rollup(ΔS)) holds for sketches."""
    mv = engine.metric_view("mv_sketch")
    src = engine._compiler.source_plan(mv.spec)
    flat = engine._compiler.baseline_projection(mv.spec, src).cache()
    try:
        cutoff = flat.agg(F.expr("percentile_approx(order_date, 0.7)")).collect()[0][0]
        old_rows, delta_rows = (
            flat.filter(F.col("order_date") <= F.lit(cutoff)),
            flat.filter(F.col("order_date") > F.lit(cutoff)),
        )
        assert delta_rows.count() > 0
        full_routed, route = mv.query_routed(
            ["market_segment", "order_status"], ["distinct_customers"]
        )
        assert route.startswith("rollup:")
        expected = _by_key(
            full_routed, ["market_segment", "order_status"], "distinct_customers"
        )

        state = engine.catalog.get("mv_sketch").state
        built = state.rollups["sketch_by_seg_status"]
        import shutil, tempfile
        from dataclasses import replace

        tmp = tempfile.mkdtemp(prefix="hll_fold_")
        shutil.rmtree(tmp)
        part_cols = {
            c: e for dec in built.decompositions.values() for e, c in dec.partials
        }
        old_rows.groupBy("market_segment", "order_status").agg(
            *[F.expr(e).alias(c) for c, e in part_cols.items()]
        ).write.parquet(tmp)
        folded_built = replace(built, path=tmp)
        fold_increment(spark, folded_built, delta_rows)
        folded = spark.read.parquet(tmp)
        dec = built.decompositions["distinct_customers"]
        got = _by_key(
            folded.select(
                "market_segment",
                "order_status",
                F.expr(dec.finalize).alias("distinct_customers"),
            ),
            ["market_segment", "order_status"],
            "distinct_customers",
        )
        shutil.rmtree(tmp, ignore_errors=True)
        assert got == expected
    finally:
        flat.unpersist()


def test_windowed_sketch_matches_exact_distinct(engine, spark, sf_dir):
    """Trailing-7d distinct users via per-day sketch grain + window union
    equals the exact windowed count(distinct) at smoke cardinality."""
    mv = engine.metric_view("mv_sketch")
    got = _by_key(
        mv.query(dimensions=["market_segment"], measures=["trailing_7d_customers"]),
        ["market_segment"],
        "trailing_7d_customers",
    )
    fct = engine.ref("fct_orders").select(
        "market_segment", "order_date", "customer_id"
    )
    # exact: per segment, distinct customers in the 7-day window ending at
    # the segment's max order_date (semiadditive last)
    last = fct.groupBy("market_segment").agg(F.max("order_date").alias("_d"))
    exact = _by_key(
        fct.join(last, "market_segment")
        .filter(F.col("order_date") > F.date_sub(F.col("_d"), 7))
        .filter(F.col("order_date") <= F.col("_d"))
        .groupBy("market_segment")
        .agg(F.countDistinct("customer_id").alias("n")),
        ["market_segment"],
        "n",
    )
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])
