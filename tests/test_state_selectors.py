"""state:modified / state:new slim-CI selection (dbt --state parity):
fingerprint stability, change detection across every config axis, the
descendants form, and the engine-level manifest round-trip."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.models import ModelError, ModelRegistry
from dbt_databricks_metrics_spark.project import build_registry


def _mk_registry(extra_meta=None, staging_fn=None):
    reg = ModelRegistry()

    def staging(spark, ref):
        return spark.range(3).withColumnRenamed("id", "k")

    def mart(spark, ref):
        return ref("staging")

    reg.model("staging", meta=dict(extra_meta or {}))(staging_fn or staging)
    reg.model("mart", deps=("staging",))(mart)
    return reg


def test_fingerprints_stable_and_sensitive():
    a = _mk_registry().fingerprints()
    b = _mk_registry().fingerprints()
    assert a == b  # same definitions -> identical manifests
    c = _mk_registry(extra_meta={"tags": ("nightly",)}).fingerprints()
    assert c["staging"] != a["staging"]  # meta change -> modified
    assert c["mart"] == a["mart"]

    def staging_v2(spark, ref):
        return spark.range(4).withColumnRenamed("id", "k")

    d = _mk_registry(staging_fn=staging_v2).fingerprints()
    assert d["staging"] != a["staging"]  # source change -> modified


def test_state_selectors(tmp_path):
    old = _mk_registry()
    manifest = str(tmp_path / "manifest.json")
    old.write_manifest(manifest)

    new = _mk_registry(extra_meta={"owner": "data-eng"})

    def extra(spark, ref):
        return ref("mart")

    new.model("extra", deps=("mart",))(extra)
    with pytest.raises(ModelError, match="load_state"):
        new.select_models(["state:modified"])
    new.load_state(manifest)
    assert new.select_models(["state:modified"]) == ["staging", "extra"]
    assert new.select_models(["state:new"]) == ["extra"]
    # descendants form: the changed staging drags mart and extra along
    assert new.select_models(["state:modified+"]) == ["staging", "mart", "extra"]


def test_engine_manifest_roundtrip(spark, sf_dir, tmp_path):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path / "wh")
    )
    manifest = str(tmp_path / "m.json")
    fps = eng.write_manifest(manifest)
    assert fps and all(len(v) == 64 for v in fps.values())
    eng.load_state(manifest)
    # nothing changed since the manifest: slim CI selects nothing
    assert eng.registry.select_models(["state:modified"]) == []
    built = eng.run(select=["state:modified"])
    assert built == {}


def test_seed_fingerprint_covers_path_options_and_contents(tmp_path):
    # review fix: every seed shares one closure fn, so path/options/file
    # contents must reach the fingerprint explicitly
    f1, f2 = tmp_path / "a.csv", tmp_path / "b.csv"
    f1.write_text("k\n1\n")
    f2.write_text("k\n2\n")

    def mk(path, **opts):
        reg = ModelRegistry()
        reg.seed("s", str(path), **opts)
        return reg.fingerprints()["s"]

    base = mk(f1)
    assert mk(f1) == base  # reproducible
    assert mk(f2) != base  # different path (and contents)
    assert mk(f1, sep="|") != base  # different csv options
    f1.write_text("k\n1\n9\n")
    assert mk(f1) != base  # same path, edited contents


def test_dynamic_fn_fingerprint_is_reproducible():
    # review fix: the getsource fallback must not embed memory addresses
    src = "def m(spark, ref):\n    f = lambda x: x\n    return f(spark)\n"

    def mk():
        ns = {}
        exec(compile(src, "<generated>", "exec"), ns)
        reg = ModelRegistry()
        reg.model("m")(ns["m"])
        return reg.fingerprints()["m"]

    assert mk() == mk()


def test_closure_state_reaches_fingerprint():
    def factory(limit):
        def m(spark, ref):
            return spark.range(limit)

        return m

    def mk(limit):
        reg = ModelRegistry()
        reg.model("m")(factory(limit))
        return reg.fingerprints()["m"]

    assert mk(3) != mk(4)  # captured parameter differs -> modified
    assert mk(3) == mk(3)
