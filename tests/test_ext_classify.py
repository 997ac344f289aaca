"""Distributed logistic regression (ext/classify.py): batch-GD rounds
vs a numpy replay, separation on a separable toy set, validation."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.classify import logreg_score, logreg_train


def _toy(spark, n=120, dim=4, seed=3):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n, dim))
    true_w = np.array([2.0, -1.5, 0.5, 0.0])
    ys = (xs @ true_w > 0).astype(int)
    rows = [(int(i), [float(v) for v in xs[i]], int(ys[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>, y INT")
    return df, xs, ys


def test_matches_numpy_batch_gd(spark):
    df, xs, ys = _toy(spark)
    got = logreg_train(df, "y", dim=4, n_iter=5, lr=0.7)
    w = np.zeros(4)
    for _ in range(5):
        z = xs @ w
        resid = 1.0 / (1.0 + np.exp(-z)) - ys
        w = w - 0.7 * (xs.T @ resid) / len(ys)
    assert got == pytest.approx(w.tolist(), rel=1e-9, abs=1e-12)


def test_training_separates(spark):
    df, xs, ys = _toy(spark)
    w = logreg_train(df, "y", dim=4, n_iter=10, lr=1.0)
    scored = logreg_score(df, w).select("y", "score").collect()
    pos = [r["score"] for r in scored if r["y"] == 1]
    neg = [r["score"] for r in scored if r["y"] == 0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2


def test_score_is_sigmoid_of_dot(spark):
    df, xs, _ys = _toy(spark, n=10)
    w = [0.3, -0.2, 0.1, 0.05]
    got = {
        r["id"]: r["score"] for r in logreg_score(df, w).collect()
    }
    for i in range(10):
        z = float(np.dot(xs[i], w))
        assert got[i] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-12)


def test_validation(spark):
    df, _xs, _ys = _toy(spark, n=5)
    with pytest.raises(ValueError, match="n_iter"):
        logreg_train(df, "y", n_iter=0)
    with pytest.raises(ValueError, match="lr"):
        logreg_train(df, "y", lr=0.0)
    empty = spark.createDataFrame([], "vector ARRAY<DOUBLE>, y INT")
    with pytest.raises(ValueError, match="empty"):
        logreg_train(empty, "y")
    # explicit dim skips the inference branch — must still raise cleanly,
    # not ZeroDivisionError at the weight update (ADVICE r3)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(empty, "y", dim=3)


def test_contract_weights_nontrivial(spark, sf_dir):
    """The lang=='en' classifier must learn a non-zero model on the
    fixture (a broken gradient pass would leave w at the zero init)."""
    import __spark_entry__ as entry

    rows = entry.queries()["logreg_weights"](spark, sf_dir).collect()
    assert len(rows) == 8
    assert any(abs(r["w"]) > 1e-4 for r in rows)


def test_binary_metrics_matches_manual(spark):
    rows = [
        # (score, y): 3 pos high, 2 neg low, one tie bucket
        (0.9, 1), (0.8, 1), (0.8, 0), (0.3, 0), (0.2, 0), (0.7, 1),
    ]
    df = spark.createDataFrame(rows, "score DOUBLE, y INT")
    from dbt_databricks_metrics_spark.ext.classify import binary_metrics

    out = binary_metrics(df, "y", n_bins=10).collect()[0]
    # bins (round(10*s)): pos {9,8,7}, neg {8,3,2}
    # pairs: each neg vs 3 pos: neg .8: below it pos {7}?? ranks:
    # neg 2: all 3 pos above -> 3; neg 3: 3; neg 8: pos 9 above (1),
    # pos 8 tie (0.5), pos 7 below (0) -> 1.5 ; AUC = (3+3+1.5)/9
    assert out["auc"] == pytest.approx(7.5 / 9)
    assert (out["tp"], out["fp"], out["tn"], out["fn"]) == (3, 1, 2, 0)
    assert (out["n_pos"], out["n_neg"]) == (3, 3)


def test_binary_metrics_perfect_and_degenerate(spark):
    from dbt_databricks_metrics_spark.ext.classify import binary_metrics

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.95, 1), (0.1, 0), (0.05, 0)], "score DOUBLE, y INT"
    )
    assert binary_metrics(perfect, "y").collect()[0]["auc"] == pytest.approx(1.0)
    onesided = spark.createDataFrame([(0.9, 1), (0.8, 1)], "score DOUBLE, y INT")
    assert binary_metrics(onesided, "y").collect()[0]["auc"] is None
    with pytest.raises(ValueError, match="n_bins"):
        binary_metrics(perfect, "y", n_bins=1)


def test_contract_classifier_learns_marker(spark, sf_dir):
    """The injected-marker contract must stay semantically non-trivial:
    AUC clearly above chance, both classes populated."""
    import __spark_entry__ as entry

    r = entry.queries()["classifier_metrics"](spark, sf_dir).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    # the contract emits AUC as the exact rational pair (rule 6)
    assert r["auc_den"] > 0
    assert r["auc_num2"] / r["auc_den"] > 0.55, (r["auc_num2"], r["auc_den"])
    assert r["tp"] + r["fn"] == r["n_pos"]
    assert r["fp"] + r["tn"] == r["n_neg"]


def test_calibration_bins_hand_computed(spark):
    from dbt_databricks_metrics_spark.ext.classify import calibration_bins

    # scores on the 1e-6 grid; n_bins=2 -> bin = round(s*2): 0, 1, 2
    rows = [
        (1, 1, 0.9),   # bin 2
        (2, 0, 0.8),   # bin 2
        (3, 1, 0.5),   # bin 1
        (4, 0, 0.4),   # bin 1
        (5, 0, 0.1),   # bin 0
    ]
    df = spark.createDataFrame(rows, "id long, y int, score double")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["sum_score_micro"], r["pos_rate"])
        for r in calibration_bins(df, "y", n_bins=2).collect()
    }
    assert got[2] == (2, 1, 1_700_000, 0.5)
    assert got[1] == (2, 1, 900_000, 0.5)
    assert got[0] == (1, 0, 100_000, 0.0)


def test_ece_report_exact_rational(spark):
    from dbt_databricks_metrics_spark.ext.classify import ece_report

    # bin 2: |1*1e6 - 1.7e6| = 7e5 ; bin 1: |1e6 - 9e5| = 1e5 ;
    # bin 0: |0 - 1e5| = 1e5  -> ece_num = 9e5, den = 5e6 (ECE = 0.18)
    rows = [(1, 1, 0.9), (2, 0, 0.8), (3, 1, 0.5), (4, 0, 0.4), (5, 0, 0.1)]
    df = spark.createDataFrame(rows, "id long, y int, score double")
    (r,) = ece_report(df, "y", n_bins=2).collect()
    assert (r["n_bins"], r["n_rows"]) == (2, 5)
    assert (r["ece_num"], r["ece_den"]) == (900_000, 5_000_000)


def test_calibration_bad_args(spark):
    import pytest as _pt

    from dbt_databricks_metrics_spark.ext.classify import calibration_bins

    df = spark.createDataFrame([(1, 1, 0.5)], "id long, y int, score double")
    with _pt.raises(ValueError, match="n_bins"):
        calibration_bins(df, "y", n_bins=1)


def test_cohen_kappa_hand_computed(spark):
    from dbt_databricks_metrics_spark.ext.classify import cohen_kappa

    # classic 2x2: raters agree on 6/10; marginals a:(7 pos,3 neg),
    # b:(5 pos,5 neg) -> pe = (7*5 + 3*5)/100 = 0.5, po = 0.6
    # kappa = (0.6-0.5)/(1-0.5) = 0.2 = kappa_num/kappa_den = 10/50
    rows = (
        [("p", "p")] * 4 + [("n", "n")] * 2
        + [("p", "n")] * 3 + [("n", "p")] * 1
    )
    df = spark.createDataFrame(rows, "rater_a STRING, rater_b STRING")
    (r,) = cohen_kappa(df, "rater_a", "rater_b").collect()
    assert (r["n"], r["n_agree"], r["pe_num"]) == (10, 6, 50)
    assert (r["kappa_num"], r["kappa_den"]) == (10, 50)


def test_cohen_kappa_excludes_nulls_and_degenerate_den(spark):
    from dbt_databricks_metrics_spark.ext.classify import cohen_kappa

    df = spark.createDataFrame(
        [("a", "a"), ("a", None), (None, "a")],
        "rater_a STRING, rater_b STRING",
    )
    (r,) = cohen_kappa(df, "rater_a", "rater_b").collect()
    # only the both-non-null row counts; single-label table ->
    # kappa_den = n^2 - pe = 1 - 1 = 0 (undefined, visibly)
    assert (r["n"], r["n_agree"], r["kappa_den"]) == (1, 1, 0)
