"""Property-style check: EVERY dim-subset × measure-subset of
mv_order_metrics must match a mechanically-generated DuckDB oracle.

This is the MEASURE() contract stated as a property — the query-time
aggregation is correct for arbitrary analyst dimension choices, not just
the documented examples. (Exhaustive over the non-window surface: 2^4
dim subsets × 2^4-1 measure subsets would be 240 plans; we sweep a
deterministic diagonal sample to keep runtime sane.)
"""

from __future__ import annotations

from itertools import combinations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry

from .conftest import assert_df_matches_oracle
from .test_engine_e2e import FCT_ORDERS_SQL

DIMS = {
    "market_segment": "market_segment",
    "order_status": "order_status",
    "order_priority": "order_priority",
    "order_year": "order_year",
}
MEASURES = {
    "total_orders": "count(*)",
    "total_revenue": "sum(total_price)",
    "avg_order_value": "avg(total_price)",
    "max_order_value": "max(total_price)",
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("whp"))
    )
    eng.run()
    return eng


def _cases():
    dim_names = list(DIMS)
    meas_names = list(MEASURES)
    cases = []
    # all single-dim × all measures, plus growing diagonals
    for k in range(0, 4):
        for dims in combinations(dim_names, k):
            meas = tuple(meas_names[: max(1, (k + 1) % 4 + 1)])
            cases.append((dims, meas))
    cases.append((tuple(dim_names), tuple(meas_names)))
    return cases


@pytest.mark.parametrize("dims,meas", _cases())
def test_measure_subset_matches_oracle(engine, duck, dims, meas):
    df = engine.metric_view("mv_order_metrics").query(list(dims), list(meas))
    sel = list(dims) + [f"{MEASURES[m]} AS {m}" for m in meas]
    group = f"GROUP BY {', '.join(dims)}" if dims else ""
    assert_df_matches_oracle(
        df,
        duck,
        f"SELECT {', '.join(sel)} FROM ({FCT_ORDERS_SQL}) {group}",
    )


WHERES = [
    "order_status = 'F'",
    "order_year >= 1995",
    "market_segment IN ('BUILDING', 'MACHINERY') AND order_status <> 'P'",
    "order_priority LIKE '1%' OR order_year = 1996",
]


def _slice_cases():
    dim_names = list(DIMS)
    meas_names = list(MEASURES)
    cases = []
    for i, w in enumerate(WHERES):
        dims = tuple(dim_names[i % len(dim_names) : i % len(dim_names) + 2])
        meas = tuple(meas_names[: (i % len(meas_names)) + 1])
        cases.append((dims, meas, w))
    # global aggregate under a slice, and full-dim grouping under a slice
    cases.append(((), tuple(meas_names), WHERES[0]))
    cases.append((tuple(dim_names), ("total_revenue",), WHERES[2]))
    return cases


@pytest.mark.parametrize("dims,meas,where", _slice_cases())
def test_sliced_measure_subset_matches_oracle(engine, duck, dims, meas, where):
    """The MEASURE() contract under a query-time WHERE slice: for any dim
    subset × measure subset × dim predicate, expansion over the sliced
    source matches the mechanically-built oracle (predicates reference
    dims both inside and outside the GROUP BY)."""
    df = engine.metric_view("mv_order_metrics").query(
        list(dims), list(meas), where=where
    )
    sel = list(dims) + [f"{MEASURES[m]} AS {m}" for m in meas]
    group = f"GROUP BY {', '.join(dims)}" if dims else ""
    assert_df_matches_oracle(
        df,
        duck,
        f"SELECT {', '.join(sel)} FROM ({FCT_ORDERS_SQL}) WHERE {where} {group}",
    )
