"""One-off exhaustive MEASURE() validation: EVERY dim-subset × measure-
subset of mv_order_metrics' non-window surface vs a generated DuckDB
oracle (2^4 dim subsets × 2^4-1 measure subsets = 240 queries), plus every
dim subset × each window measure. Heavier than CI needs — run ad hoc:

    python scripts/exhaustive_sweep.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.session import get_spark

DIMS = ["market_segment", "order_status", "order_priority", "order_year"]
MEASURES = {
    "total_orders": "count(*)",
    "total_revenue": "sum(total_price)",
    "avg_order_value": "avg(total_price)",
    "max_order_value": "max(total_price)",
}

FCT_SQL = """
    SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
           c.c_mktsegment AS market_segment, o.o_orderstatus AS order_status,
           o.o_totalprice AS total_price, CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority AS order_priority,
           CAST(year(o.o_orderdate) AS INT) AS order_year
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


def norm_rows(cols, rows):
    idx = [cols.index(c) for c in sorted(cols)]

    def n(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, max(0, 6 - int(math.log10(abs(v))))) if v else 0.0
        return str(v)

    return sorted(tuple(n(r[i]) for i in idx) for r in rows)


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sweep", cpus=8)
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=tempfile.mkdtemp()
    )
    eng.run()
    mv = eng.metric_view("mv_order_metrics")

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    total = 0
    for k in range(len(DIMS) + 1):
        for dims in combinations(DIMS, k):
            for mk in range(1, len(MEASURES) + 1):
                for meas in combinations(list(MEASURES), mk):
                    total += 1
                    df = mv.query(list(dims), list(meas))
                    scols, srows = df.columns, [tuple(r) for r in df.collect()]
                    sel = list(dims) + [f"{MEASURES[m]} AS {m}" for m in meas]
                    grp = f"GROUP BY {', '.join(dims)}" if dims else ""
                    res = con.execute(
                        f"SELECT {', '.join(sel)} FROM ({FCT_SQL}) {grp}"
                    )
                    dcols = [d[0] for d in res.description]
                    drows = res.fetchall()
                    s = norm_rows(scols, srows)
                    d = norm_rows(dcols, drows)
                    if len(s) != len(d) or any(
                        not all(close(x, y) if isinstance(x, float) else x == y
                                for x, y in zip(a, b))
                        for a, b in zip(s, d)
                    ):
                        failures += 1
                        print(f"FAIL dims={dims} measures={meas}")
    print(f"{total - failures}/{total} exact-measure combos match")

    # window measures × every dim subset
    wtotal = wfail = 0
    for k in range(len(DIMS) + 1):
        for dims in combinations(DIMS, k):
            for wm in ("trailing_7d_revenue", "cumulative_revenue"):
                wtotal += 1
                try:
                    n = mv.query(list(dims), [wm]).count()
                    assert n > 0
                except Exception as e:  # noqa: BLE001
                    wfail += 1
                    print(f"WINDOW FAIL dims={dims} {wm}: {e}")
    print(f"{wtotal - wfail}/{wtotal} window-measure combos execute")
    return 1 if failures or wfail else 0


if __name__ == "__main__":
    raise SystemExit(main())
