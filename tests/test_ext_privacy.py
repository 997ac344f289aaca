"""k-anonymity governance (ext/privacy.py): group flagging, report
arithmetic, suppression semantics, and the released-set invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import privacy


@pytest.fixture(scope="module")
def people(spark):
    rows = (
        [("NY", "a") for _ in range(5)]
        + [("NY", "b") for _ in range(2)]
        + [("CA", "a") for _ in range(7)]
        + [("TX", "c")]
    )
    return spark.createDataFrame(
        [(i, s, g) for i, (s, g) in enumerate(rows)],
        "id INT, state STRING, grp STRING",
    )


def test_groups_flagged(people):
    got = {
        (r["state"], r["grp"]): (r["group_size"], r["suppressed"])
        for r in privacy.k_anonymity_groups(people, ["state", "grp"], k=5).collect()
    }
    assert got[("NY", "a")] == (5, False)
    assert got[("NY", "b")] == (2, True)
    assert got[("CA", "a")] == (7, False)
    assert got[("TX", "c")] == (1, True)


def test_report(people):
    (r,) = privacy.k_anonymity_report(people, ["state", "grp"], k=5).collect()
    assert (r["n_groups"], r["n_groups_suppressed"]) == (4, 2)
    assert (r["n_rows"], r["n_rows_suppressed"]) == (15, 3)
    assert r["achieved_k"] == 5


def test_suppression_yields_k_anonymous_release(people):
    out = privacy.suppress_small_groups(people, ["state", "grp"], k=5)
    assert out.count() == 12
    sizes = [
        r["group_size"]
        for r in privacy.k_anonymity_groups(out, ["state", "grp"], k=5).collect()
    ]
    assert min(sizes) >= 5  # the release IS k-anonymous


def test_all_suppressed_reports_zero_achieved(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id INT, q STRING")
    (r,) = privacy.k_anonymity_report(df, ["q"], k=5).collect()
    assert r["achieved_k"] == 0 and r["n_rows_suppressed"] == 2
    assert privacy.suppress_small_groups(df, ["q"], k=5).count() == 0


def test_bad_args(people):
    with pytest.raises(ValueError, match="k must be"):
        privacy.k_anonymity_groups(people, ["state"], k=1)
    with pytest.raises(ValueError, match="non-empty"):
        privacy.k_anonymity_groups(people, [], k=5)


@pytest.fixture(scope="module")
def patients(spark):
    # (state, grp) quasi-groups with controlled sensitive diversity:
    # NY/a: 5 rows, 3 distinct conditions (diverse at l=2, low at l=4)
    # CA/a: 4 rows, 1 distinct condition (homogeneous — the attack case)
    # TX/b: 3 rows, 3 distinct (fully diverse), one NULL doesn't count
    rows = [
        ("NY", "a", "flu"),
        ("NY", "a", "flu"),
        ("NY", "a", "cold"),
        ("NY", "a", "cold"),
        ("NY", "a", "burn"),
        ("CA", "a", "flu"),
        ("CA", "a", "flu"),
        ("CA", "a", "flu"),
        ("CA", "a", "flu"),
        ("TX", "b", "flu"),
        ("TX", "b", "cold"),
        ("TX", "b", "burn"),
        ("TX", "b", None),
    ]
    return spark.createDataFrame(
        [(i, s, g, c) for i, (s, g, c) in enumerate(rows)],
        "id INT, state STRING, grp STRING, condition STRING",
    )


def test_l_diversity_groups(patients):
    got = {
        (r["state"], r["grp"]): (r["group_size"], r["n_sensitive"], r["low_diversity"])
        for r in privacy.l_diversity_groups(
            patients, ["state", "grp"], "condition", l=3
        ).collect()
    }
    assert got[("NY", "a")] == (5, 3, False)
    assert got[("CA", "a")] == (4, 1, True)  # k-anonymous yet homogeneous
    assert got[("TX", "b")] == (4, 3, False)  # NULL is not a 4th value


def test_l_diversity_report(patients):
    (r,) = privacy.l_diversity_report(
        patients, ["state", "grp"], "condition", l=3
    ).collect()
    assert (r["n_groups"], r["n_groups_low"]) == (3, 1)
    assert (r["n_rows"], r["n_rows_low"]) == (13, 4)
    assert r["achieved_l"] == 3


def test_suppression_yields_l_diverse_release(patients):
    out = privacy.suppress_low_diversity(patients, ["state", "grp"], "condition", l=3)
    assert out.count() == 9
    assert out.filter(F.col("state") == "CA").count() == 0
    (r,) = privacy.l_diversity_report(
        out, ["state", "grp"], "condition", l=3
    ).collect()
    assert r["n_groups_low"] == 0  # the release IS l-diverse


def test_l_diversity_all_low_and_bad_args(spark, patients):
    df = spark.createDataFrame([(1, "x", "c"), (2, "x", "c")], "id INT, q STRING, s STRING")
    (r,) = privacy.l_diversity_report(df, ["q"], "s", l=2).collect()
    assert r["achieved_l"] == 0 and r["n_rows_low"] == 2
    assert privacy.suppress_low_diversity(df, ["q"], "s", l=2).count() == 0
    with pytest.raises(ValueError, match="l must be"):
        privacy.l_diversity_groups(patients, ["state"], "condition", l=1)
    with pytest.raises(ValueError, match="non-empty"):
        privacy.l_diversity_groups(patients, [], "condition", l=2)


@pytest.fixture(scope="module")
def salaries(spark):
    # buckets: X all low (b1), Y all high (b3), Z mirrors the global
    # 50/50 split. N=8, m=2, cumt=(4,8):
    #   X (gs=3): cumg=(3,3) -> emd_num=|24-12|=12, den=24, EMD=1/2
    #   Y (gs=3): cumg=(0,3) -> emd_num=12,           EMD=1/2
    #   Z (gs=2): cumg=(1,2) -> emd_num=0,            EMD=0
    rows = (
        [("X", 1)] * 3 + [("Y", 3)] * 3 + [("Z", 1), ("Z", 3)]
    )
    return spark.createDataFrame(
        [(i, g, b) for i, (g, b) in enumerate(rows)],
        "id INT, grp STRING, bucket INT",
    )


def test_t_closeness_groups_exact_rational(salaries):
    got = {
        r["grp"]: (r["group_size"], r["emd_num"], r["emd_den"], r["distant"])
        for r in privacy.t_closeness_groups(
            salaries, ["grp"], "bucket", t=(1, 4)
        ).collect()
    }
    assert got["X"] == (3, 12, 24, True)   # EMD 1/2 > 1/4
    assert got["Y"] == (3, 12, 24, True)
    assert got["Z"] == (2, 0, 16, False)   # EMD 0


def test_t_closeness_report_and_suppress(salaries):
    (r,) = privacy.t_closeness_report(salaries, ["grp"], "bucket", t=(1, 4)).collect()
    assert (r["t_num"], r["t_den"]) == (1, 4)
    assert (r["n_groups"], r["n_groups_far"]) == (3, 2)
    assert (r["n_rows"], r["n_rows_far"]) == (8, 6)
    out = privacy.suppress_distant_groups(salaries, ["grp"], "bucket", t=(1, 4))
    assert sorted(x["grp"] for x in out.collect()) == ["Z", "Z"]


def test_t_closeness_single_bucket_is_zero(spark):
    df = spark.createDataFrame([(1, "a", 7), (2, "b", 7)], "id INT, g STRING, b INT")
    rows = privacy.t_closeness_groups(df, ["g"], "b", t=(1, 100)).collect()
    assert all(r["emd_num"] == 0 and not r["distant"] for r in rows)
    assert all(r["emd_den"] > 0 for r in rows)  # max(m-1,1) guard


def test_t_closeness_bad_args(salaries):
    with pytest.raises(ValueError, match="rational"):
        privacy.t_closeness_groups(salaries, ["grp"], "bucket", t=(1, 0))
    with pytest.raises(ValueError, match="non-empty"):
        privacy.t_closeness_groups(salaries, [], "bucket")


def test_null_quasi_keys_are_suppressible(spark):
    # review fix: plain equi anti-joins never match NULL keys, leaking
    # flagged rows into the release
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y"), (3, "A", "x")] + [("%d" % i, "B", "x") for i in range(4, 10)],
        "id STRING, state STRING, cond STRING",
    )
    out = privacy.suppress_small_groups(df, ["state"], k=5)
    assert out.filter(F.col("state").isNull()).count() == 0  # NULL group (2 rows) suppressed
    assert out.count() == 6  # only the B group survives
    out2 = privacy.suppress_low_diversity(df, ["state"], "cond", l=2)
    states = {r["state"] for r in out2.collect()}
    assert "B" not in states  # B has 1 distinct cond -> suppressed
    assert None in states  # NULL group has 2 distinct conds -> kept


def test_t_closeness_null_quasi_and_null_bucket(spark):
    rows = (
        [(None, 1)] * 2 + [(None, 3)] * 2   # NULL-key group mirrors global
        + [("X", 1)] * 2 + [("Y", 3)] * 2
        + [("X", None)]                      # NULL bucket: excluded entirely
    )
    df = spark.createDataFrame(
        [(i, g, b) for i, (g, b) in enumerate(rows)],
        "id INT, grp STRING, bucket INT",
    )
    got = {
        r["grp"]: (r["group_size"], r["emd_num"], r["distant"])
        for r in privacy.t_closeness_groups(df, ["grp"], "bucket", t=(1, 4)).collect()
    }
    # NULL-key group: 50/50 like the global -> EMD 0, NOT maximally distant
    assert got[None] == (4, 0, False)
    # X's NULL-bucket row is excluded: group_size 2, all in bucket 1
    assert got["X"][0] == 2 and got["X"][2] is True
    assert got["Y"][2] is True
    out = privacy.suppress_distant_groups(df, ["grp"], "bucket", t=(1, 4))
    kept = {r["grp"] for r in out.collect()}
    assert kept == {None}  # X and Y suppressed; NULL-key group kept
