"""Generic reader/sink round-trips (csv/json/parquet) + partitioned sink."""

from __future__ import annotations

import os

import pytest

from dbt_databricks_metrics_spark.sources import load_table, read_source, write_sink


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").limit(200).cache()


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, orders, tmp_path, fmt):
    p = str(tmp_path / f"rt_{fmt}")
    write_sink(orders, p, format=fmt)
    back = read_source(spark, p, format=fmt)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_partitioned_sink(spark, orders, tmp_path):
    p = str(tmp_path / "parts")
    write_sink(orders, p, partition_by=["o_orderstatus"])
    dirs = {d for d in os.listdir(p) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2
    assert read_source(spark, p).count() == orders.count()


def test_bad_format_rejected(spark, orders, tmp_path):
    with pytest.raises(ValueError, match="unsupported source format"):
        read_source(spark, "/nope", format="avro")
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_sink(orders, str(tmp_path / "x"), format="xml")
