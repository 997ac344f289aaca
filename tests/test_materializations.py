"""Ephemeral / incremental / snapshot materializations (models.py) —
completing the dbt materialization surface beyond the reference's
view/table pair."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.models import (
    ModelError,
    ModelRegistry,
    Runner,
    snapshot_scd2,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------------- ephemeral


def test_ephemeral_flows_to_ref_without_view_or_files(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("eph", materialized="ephemeral")
    def eph(spark_, ref):
        return spark_.range(3).select(F.col("id"), (F.col("id") * 2).alias("v"))

    @reg.model("consumer", deps=["eph"])
    def consumer(spark_, ref):
        return ref("eph").filter("v >= 2")

    r = Runner(spark, reg, warehouse_dir=str(tmp_path))
    built = r.run()
    assert built["consumer"].count() == 2
    assert not os.path.exists(os.path.join(str(tmp_path), "eph"))
    # ephemeral models are not registered in the session catalog
    assert not any(t.name == "eph" for t in spark.catalog.listTables())


# ----------------------------------------------------------- incremental


def _inc_registry(strategy, **kw):
    reg = ModelRegistry()
    holder = {"lo": 0, "hi": 10}

    @reg.model(
        "inc", materialized="incremental", incremental_strategy=strategy, **kw
    )
    def inc(spark_, ref, ctx):
        df = spark_.range(holder["lo"], holder["hi"]).select(
            F.col("id"),
            (F.col("id") % 3).cast("int").alias("part"),
            (F.col("id") * 10).alias("v"),
        )
        return df

    return reg, holder


def test_incremental_first_run_builds_full(spark, tmp_path):
    reg, holder = _inc_registry("append")
    r = Runner(spark, reg, warehouse_dir=str(tmp_path))
    assert r.run()["inc"].count() == 10


def test_incremental_append(spark, tmp_path):
    reg, holder = _inc_registry("append")
    r = Runner(spark, reg, warehouse_dir=str(tmp_path))
    r.run()
    holder["lo"], holder["hi"] = 10, 15
    out = Runner(spark, reg, warehouse_dir=str(tmp_path)).run()["inc"]
    assert out.count() == 15
    assert out.agg(F.max("id")).first()[0] == 14


def test_incremental_insert_overwrite_replaces_touched_partitions(
    spark, tmp_path
):
    reg, holder = _inc_registry("insert_overwrite", partition_by=("part",))
    r = Runner(spark, reg, warehouse_dir=str(tmp_path))
    r.run()
    # second run: a single part=0 row (id 30) — partition 0 must be
    # replaced wholesale (ids 0,3,6,9 gone), partitions 1 and 2 untouched
    holder["lo"], holder["hi"] = 30, 31
    out = Runner(spark, reg, warehouse_dir=str(tmp_path)).run()["inc"]
    assert _rows(out.filter("part = 0"), "id") == [(30,)]
    assert _rows(out.filter("part = 1"), "id") == [(1,), (4,), (7,)]
    assert _rows(out.filter("part = 2"), "id") == [(2,), (5,), (8,)]


def test_incremental_merge_upserts_by_key(spark, tmp_path):
    reg = ModelRegistry()
    state = {"rows": [(1, "a"), (2, "b")]}

    @reg.model(
        "m", materialized="incremental", incremental_strategy="merge",
        unique_key=("id",),
    )
    def m(spark_, ref, ctx):
        return spark_.createDataFrame(state["rows"], ["id", "v"])

    Runner(spark, reg, warehouse_dir=str(tmp_path)).run()
    state["rows"] = [(2, "B"), (3, "c")]  # update 2, insert 3, keep 1
    out = Runner(spark, reg, warehouse_dir=str(tmp_path)).run()["m"]
    assert _rows(out, "id", "v") == [(1, "a"), (2, "B"), (3, "c")]


def test_incremental_context_reports_state(spark, tmp_path):
    reg = ModelRegistry()
    seen = []

    @reg.model("w", materialized="incremental")
    def w(spark_, ref, ctx):
        seen.append(ctx.is_incremental)
        if ctx.is_incremental:
            hi = ctx.existing().agg(F.max("id")).first()[0]
            return spark_.range(hi + 1, hi + 4).select("id")
        return spark_.range(3).select("id")

    Runner(spark, reg, warehouse_dir=str(tmp_path)).run()
    out = Runner(spark, reg, warehouse_dir=str(tmp_path)).run()["w"]
    assert seen == [False, True]
    assert out.count() == 6 and out.agg(F.max("id")).first()[0] == 5


def test_incremental_validation():
    reg = ModelRegistry()
    with pytest.raises(ModelError, match="insert_overwrite"):
        @reg.model("x", materialized="incremental",
                   incremental_strategy="insert_overwrite")
        def x(spark_, ref):
            pass
    with pytest.raises(ModelError, match="unique_key"):
        @reg.model("y", materialized="incremental",
                   incremental_strategy="merge")
        def y(spark_, ref):
            pass
    with pytest.raises(ModelError, match="incremental_strategy"):
        @reg.model("z", materialized="incremental",
                   incremental_strategy="replace_all")
        def z(spark_, ref):
            pass


# -------------------------------------------------------------- snapshot


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["id", "seg", "bal"])


def test_scd2_first_run_opens_all(spark, tmp_path):
    p = str(tmp_path / "snap")
    out = snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)]), p,
        unique_key=("id",), snapshot_at="2024-01-01",
    )
    assert out.count() == 2
    assert out.filter("valid_to IS NULL").count() == 2
    assert {r["valid_from"].isoformat() for r in out.collect()} == {"2024-01-01"}


def test_scd2_change_closes_and_opens(spark, tmp_path):
    p = str(tmp_path / "snap")
    snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)]), p,
        unique_key=("id",), snapshot_at="2024-01-01",
    )
    out = snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0), (2, "B", 99.0), (3, "C", 30.0)]),
        p, unique_key=("id",), snapshot_at="2024-02-01",
    )
    hist = {(r["id"], r["bal"], str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
            for r in out.collect()}
    assert hist == {
        (1, 10.0, "2024-01-01", None),            # unchanged
        (2, 20.0, "2024-01-01", "2024-02-01"),    # closed generation
        (2, 99.0, "2024-02-01", None),            # new generation
        (3, 30.0, "2024-02-01", None),            # new key
    }


def test_scd2_check_cols_scope_changes(spark, tmp_path):
    p = str(tmp_path / "snap")
    snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0)]), p,
        unique_key=("id",), check_cols=("seg",), snapshot_at="2024-01-01",
    )
    # bal changes but seg does not -> NOT a new generation under check_cols
    out = snapshot_scd2(
        spark, _snap(spark, [(1, "A", 77.0)]), p,
        unique_key=("id",), check_cols=("seg",), snapshot_at="2024-02-01",
    )
    assert out.count() == 1 and out.first()["bal"] == 10.0


def test_scd2_hard_deletes(spark, tmp_path):
    p = str(tmp_path / "snap")
    snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)]), p,
        unique_key=("id",), snapshot_at="2024-01-01",
    )
    # default: deleted keys stay open
    out = snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0)]), p,
        unique_key=("id",), snapshot_at="2024-02-01",
    )
    assert out.filter("id = 2 AND valid_to IS NULL").count() == 1
    # invalidate_hard_deletes: deleted keys close
    out = snapshot_scd2(
        spark, _snap(spark, [(1, "A", 10.0)]), p,
        unique_key=("id",), snapshot_at="2024-03-01",
        invalidate_hard_deletes=True,
    )
    assert out.filter("id = 2 AND valid_to IS NULL").count() == 0
    assert out.filter("id = 2").first()["valid_to"].isoformat() == "2024-03-01"


def test_scd2_unchanged_is_idempotent(spark, tmp_path):
    p = str(tmp_path / "snap")
    rows = [(1, "A", 10.0), (2, "B", 20.0)]
    a = snapshot_scd2(spark, _snap(spark, rows), p, unique_key=("id",),
                      snapshot_at="2024-01-01").collect()
    b = snapshot_scd2(spark, _snap(spark, rows), p, unique_key=("id",),
                      snapshot_at="2024-02-01").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_scd2_via_runner_and_validation(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("snapm", materialized="snapshot", unique_key=("id",))
    def snapm(spark_, ref):
        return _snap(spark_, [(1, "A", 10.0)])

    with pytest.raises(ModelError, match="snapshot_at"):
        Runner(spark, reg, warehouse_dir=str(tmp_path)).run()
    out = Runner(
        spark, reg, warehouse_dir=str(tmp_path), snapshot_at="2024-01-01"
    ).run()["snapm"]
    assert out.count() == 1 and "valid_from" in out.columns

    with pytest.raises(ModelError, match="unique_key"):
        @reg.model("bad", materialized="snapshot")
        def bad(spark_, ref):
            pass


# ------------------------------------------------------------------ seed


def test_seed_loads_csv_as_table(spark, tmp_path):
    csv = tmp_path / "mapping.csv"
    csv.write_text("code,label\n1,alpha\n2,beta\n")
    reg = ModelRegistry()
    reg.seed("mapping", str(csv))

    @reg.model("uses_seed", deps=["mapping"])
    def uses_seed(spark_, ref):
        return ref("mapping").filter("code = 2")

    built = Runner(spark, reg, warehouse_dir=str(tmp_path / "wh")).run()
    assert _rows(built["mapping"], "code", "label") == [(1, "alpha"), (2, "beta")]
    assert built["uses_seed"].first()["label"] == "beta"


def test_seed_with_explicit_schema(spark, tmp_path):
    csv = tmp_path / "s.csv"
    csv.write_text("k,v\n1,2.5\n")
    reg = ModelRegistry()
    reg.seed("s", str(csv), schema="k INT, v DOUBLE")
    built = Runner(spark, reg, warehouse_dir=str(tmp_path / "wh")).run()
    row = built["s"].first()
    assert row["k"] == 1 and row["v"] == 2.5


def test_run_results_artifact(spark, sf_dir, tmp_path):
    """dbt run_results parity: every executed model gets a timed status
    row in topological order; the JSON artifact round-trips; a failing
    model is recorded as 'error' before the exception surfaces."""
    import json

    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.project import build_registry

    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path / "whrr")
    )
    eng.run()
    res = eng.run_results
    names = [r.model for r in res]
    assert set(names) == set(eng.registry.names())
    assert names == [n for n in eng.registry.topo_order() if n in set(names)]
    assert all(r.status == "success" and r.duration_s >= 0 for r in res)

    p = eng.write_run_results(str(tmp_path / "run_results.json"))
    payload = json.load(open(p))
    assert len(payload["results"]) == len(res)
    assert payload["elapsed_s"] > 0

    from dbt_databricks_metrics_spark.models import ModelRegistry

    reg = ModelRegistry()

    @reg.model("boom")
    def boom(spark, ref):
        raise RuntimeError("kaput")

    eng2 = MetricEngine(spark, reg, warehouse_dir=str(tmp_path / "whrr2"))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="kaput"):
        eng2.run()
    (only,) = eng2.run_results
    assert only.status == "error" and "kaput" in only.message


def test_model_contract_enforced(spark, sf_dir, tmp_path):
    """dbt model contracts: the declared interface must match exactly —
    wrong type, missing column, or undeclared extras fail the BUILD."""
    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.models import ModelError, ModelRegistry
    from dbt_databricks_metrics_spark.project import build_registry

    # the real project declares a contract on stg_orders and builds green
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path / "whc")
    )
    eng.run(select=["stg_orders"])

    contract = {
        "columns": [
            {"name": "a", "data_type": "bigint"},
            {"name": "b", "data_type": "string"},
        ]
    }

    def fresh(fn):
        reg = ModelRegistry()
        reg.model("m", meta={"contract": contract})(fn)
        return MetricEngine(spark, reg, warehouse_dir=str(tmp_path / "whc2"))

    ok = fresh(lambda s, ref: s.createDataFrame([(1, "x")], "a long, b string"))
    ok.run()

    bad_type = fresh(lambda s, ref: s.createDataFrame([(1, 2)], "a long, b int"))
    with pytest.raises(ModelError, match="declared string, actual int"):
        bad_type.run()

    missing = fresh(lambda s, ref: s.createDataFrame([(1,)], "a long"))
    with pytest.raises(ModelError, match="missing column 'b'"):
        missing.run()

    extra = fresh(
        lambda s, ref: s.createDataFrame([(1, "x", 0.5)], "a long, b string, c double")
    )
    with pytest.raises(ModelError, match="undeclared columns"):
        extra.run()


def test_exposures_validated_after_run(spark, sf_dir, tmp_path):
    """dbt exposures: declared downstream consumers validate against
    models AND metric views; dangling refs fail the run."""
    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.models import ModelError
    from dbt_databricks_metrics_spark.project import build_registry

    reg = build_registry(sf_dir)
    reg.exposure(
        "revenue_dashboard",
        depends_on=["fct_orders", "mv_order_metrics"],
        owner="analytics",
        type="dashboard",
    )
    eng = MetricEngine(spark, reg, warehouse_dir=str(tmp_path / "whex1"))
    eng.run()  # mv_order_metrics registers in the on-run-end hook
    assert [e.name for e in reg.exposures()] == ["revenue_dashboard"]

    reg2 = build_registry(sf_dir)
    reg2.exposure("broken", depends_on=["no_such_model"])
    eng2 = MetricEngine(spark, reg2, warehouse_dir=str(tmp_path / "whex2"))
    with pytest.raises(ModelError, match="unknown refs.*no_such_model"):
        eng2.run()


class TestGraphSelectors:
    @staticmethod
    def _registry():
        from dbt_databricks_metrics_spark.models import ModelRegistry

        reg = ModelRegistry()

        def mk(name, deps=(), tags=()):
            @reg.model(name, deps=list(deps), meta={"tags": list(tags)})
            def _m(spark, ref, _n=name):  # pragma: no cover - graph only
                raise AssertionError("not built in selector tests")

        #   a -> b -> c -> e
        #        b -> d
        #   f (island, tagged)
        mk("a")
        mk("b", deps=("a",), tags=("mart",))
        mk("c", deps=("b",))
        mk("d", deps=("b",), tags=("mart",))
        mk("e", deps=("c",))
        mk("f", tags=("island",))
        return reg

    def test_plus_forms(self):
        reg = self._registry()
        assert reg.select_models(["b"]) == ["b"]
        assert reg.select_models(["+b"]) == ["a", "b"]
        assert reg.select_models(["b+"]) == ["b", "c", "d", "e"]
        assert reg.select_models(["+b+"]) == ["a", "b", "c", "d", "e"]
        assert reg.select_models(["b+1"]) == ["b", "c", "d"]
        assert reg.select_models(["1+e"]) == ["c", "e"]

    def test_tag_at_union_intersection(self):
        reg = self._registry()
        assert reg.select_models(["tag:mart"]) == ["b", "d"]
        assert reg.select_models(["tag:island f"]) == ["f"]
        # union via space; intersection via comma
        assert reg.select_models(["tag:mart b+"]) == ["b", "c", "d", "e"]
        assert reg.select_models(["b+,tag:mart"]) == ["b", "d"]
        # @c = c + descendants(e) + all their ancestors
        assert reg.select_models(["@c"]) == ["a", "b", "c", "e"]

    def test_unknown_selector_raises(self):
        import pytest as _pytest

        from dbt_databricks_metrics_spark.models import ModelError

        reg = self._registry()
        with _pytest.raises(ModelError):
            reg.select_models(["nope+"])
        with _pytest.raises(ModelError):
            reg.select_models(["+%bad%"])

    def test_runner_expands_selectors(self, spark, sf_dir):
        """engine.run(select=['stg_orders+']) builds the staging model and
        every downstream consumer, nothing unrelated."""
        import tempfile

        from dbt_databricks_metrics_spark.engine import MetricEngine
        from dbt_databricks_metrics_spark.project import build_registry

        eng = MetricEngine(
            spark,
            build_registry(sf_dir),
            warehouse_dir=tempfile.mkdtemp(prefix="sel_wh_"),
        )
        built = eng._runner.run(select=["stg_orders+"])
        assert "stg_orders" in built
        assert "fct_orders" in built  # descendant
        assert "stg_lineitem" not in built  # unrelated branch
