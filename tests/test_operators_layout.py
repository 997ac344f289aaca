"""Z-order layout + parquet min/max pruning evidence (operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.operators.layout import (
    file_skipping_stats,
    zorder_key,
    zorder_layout,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )


def test_zorder_preserves_content(spark, lineitem, tmp_path):
    out = str(tmp_path / "z")
    zorder_layout(lineitem, ["l_orderkey", "l_partkey"], 8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == lineitem.count()
    a = lineitem.agg(F.sum("l_extendedprice"), F.sum("l_orderkey")).first()
    b = back.agg(F.sum("l_extendedprice"), F.sum("l_orderkey")).first()
    assert a[0] == pytest.approx(b[0], rel=1e-12)  # summation order differs
    assert a[1] == b[1]
    assert back.columns == lineitem.columns  # _zkey never materializes


def test_zorder_prunes_secondary_column(spark, lineitem, tmp_path):
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    n = 16
    (
        lineitem.repartitionByRange(n, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(lin)
    )
    zorder_layout(lineitem, ["l_orderkey", "l_partkey"], n).write.parquet(zo)
    pk = lineitem.first()["l_partkey"]
    lin_frac = file_skipping_stats(lin, "l_partkey", pk)["scan_frac"]
    zo_frac = file_skipping_stats(zo, "l_partkey", pk)["scan_frac"]
    # single-key layout cannot prune the secondary column at all;
    # z-order must skip at least half the row groups for it
    assert lin_frac == 1.0
    assert zo_frac <= 0.5
    # and the primary column still prunes under z-order (not degenerate)
    ok = lineitem.first()["l_orderkey"]
    assert file_skipping_stats(zo, "l_orderkey", ok)["scan_frac"] <= 0.75


def test_zorder_key_is_rank_correlated(spark):
    df = spark.range(256).select(
        F.col("id").alias("x"), (F.lit(255) - F.col("id")).alias("y")
    )
    z = df.select("x", zorder_key(df, ["x"]).alias("z")).collect()
    xs = sorted(z, key=lambda r: r["x"])
    zs = [r["z"] for r in xs]
    assert zs == sorted(zs)  # single column: morton == scaled rank order


def test_zorder_constant_column_is_safe(spark):
    df = spark.range(10).select(F.col("id"), F.lit(7).alias("c"))
    out = df.select(zorder_key(df, ["id", "c"]).alias("z")).collect()
    assert len({r["z"] for r in out}) > 1  # id still differentiates


def test_zorder_validation(spark, lineitem):
    with pytest.raises(ValueError, match="1-4"):
        zorder_key(lineitem, [])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(lineitem, ["l_orderkey", "l_partkey"], bits=32)


def test_file_skipping_counts_statless_groups_as_reads(tmp_path, spark):
    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    s = file_skipping_stats(p, "no_such_col", 5)
    assert s["matching"] == s["row_groups"]  # unknown column -> must read
