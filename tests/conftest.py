from __future__ import annotations

import os

import duckdb
import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from dbt_databricks_metrics_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture()
def duck(sf_dir):
    """DuckDB connection with fixture tables registered as views, mirroring
    the driver's oracle harness (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.fixture()
def duck_oracle():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(SF_ORACLE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql: str, rel_tol: float = 1e-6):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB query —
    the same contract the driver's CORRECTNESS gate applies (row count +
    schema column names + values). Floats compare with relative tolerance
    (summation order differs between engines); rows sort by a coarse key
    so float noise cannot reorder them."""
    import math
    from decimal import Decimal

    spark_rows = [tuple(r) for r in spark_df.collect()]
    cols = spark_df.columns
    duck_res = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = [tuple(r) for r in duck_res.fetchall()]

    assert sorted(cols) == sorted(duck_cols), f"schema mismatch: {cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    sidx = [cols.index(c) for c in sorted(cols)]
    didx = [duck_cols.index(c) for c in sorted(cols)]

    def conv(v):
        if hasattr(v, "isoformat"):
            return v.isoformat()[:19]
        if isinstance(v, Decimal):
            return float(v)
        if isinstance(v, list):
            return tuple(v)
        return v

    def key(t):
        out = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("nan")
                elif v == 0:
                    out.append("0")
                else:
                    out.append(str(round(v, max(0, 5 - int(math.log10(abs(v)))))))
            else:
                out.append(str(v))
        return tuple(out)

    def close(a, b):
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return math.isnan(fa) == math.isnan(fb)
            return math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=1e-9)
        return a == b

    s_sorted = sorted((tuple(conv(r[i]) for i in sidx) for r in spark_rows), key=key)
    d_sorted = sorted((tuple(conv(r[i]) for i in didx) for r in duck_rows), key=key)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert len(a) == len(b) and all(close(x, y) for x, y in zip(a, b)), (
            f"row {i} mismatch:\n  spark={a}\n  duck ={b}"
        )
