"""Distributed logistic-regression training ([EXT]) — the corpus-scale
quality-classifier trainer. FineWeb-Edu / DCLM-style pipelines train a
small linear classifier over document features and score the whole
corpus with it (public recipe); the algorithm here is plain batch
gradient descent on the logistic loss (public, any ML textbook).

Scale shape (100 TB posture), the k-means pattern applied to GD:

* per round ONE aggregate pass — the per-document residual
  ``sigmoid(w·x) − y`` is a codegen column expression with the current
  weights folded in as ARRAY LITERALS (no weight join, no UDF), and the
  gradient is a ``posexplode → groupBy(dim) sum`` with map-side combine,
  so the shuffle carries dim partial sums per partition, independent of
  corpus size;
* the driver receives dim doubles per round (the model — like k-means
  centroids), updates, and folds them into the next round's literals;
* features are cached/localCheckpointed once — round plans stay flat.

Determinism: given identical features and labels, every round is one
IEEE expression per row plus order-free integer-count division points —
summation order contributes ~1e-15; contract outputs round to 6 (the
repo's float-stability discipline). The training loop unrolls to SQL
CTEs for the DuckDB oracle exactly like PageRank/BPE.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train(
    df: DataFrame,
    label_col: str,
    vec_col: str = "vector",
    dim: int | None = None,
    n_iter: int = 3,
    lr: float = 0.5,
    grad_scale: int | None = None,
) -> list[float]:
    """Batch-GD logistic regression; returns the weight vector after
    *n_iter* full-batch rounds from a zero init (deterministic — no
    random init, no shuffling; the classic convex-loss setting where
    batch GD needs none).

    *label_col* must be 0/1 (int); *vec_col* an array<double> of fixed
    width *dim* (inferred from the first row when omitted).

    *grad_scale* (e.g. ``10**9``) switches the gradient accumulation to
    an integer grid: each per-(row, dim) contribution quantizes to
    ``round(resid·x_i·grad_scale)`` as int64 BEFORE the distributed
    sum, making the learned weights bit-identical under ANY partition
    layout or summation order (a float sum is the one
    accumulation-order-dependent step in batch GD; everything else is
    a per-row codegen expression). The grid error per contribution is
    ≤ 0.5/grad_scale — far below the round-6 weight grid contracts pin.
    Capacity: |contribution| ≤ grad_scale (resid, normalized x ≤ 1), so
    int64 holds ~9.2e18/grad_scale rows; at 1e9 that is ~9 billion
    docs per full batch — shard or lower the scale beyond that.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if grad_scale is not None and grad_scale < 1:
        raise ValueError(f"grad_scale must be >= 1, got {grad_scale}")
    feats = df.select(
        F.col(label_col).cast("double").alias("_y"),
        F.col(vec_col).cast("array<double>").alias("_x"),
    ).localCheckpoint(eager=True)
    if dim is None:
        first = feats.select(F.size("_x").alias("d")).first()
        if first is None:
            raise ValueError("logreg_train: empty input")
        dim = int(first["d"])
    # n folds into round 1's gradient aggregate (one job instead of two);
    # it is constant across rounds
    n: int | None = None
    w = [0.0] * dim
    for it in range(n_iter):
        wlits = F.array(*[F.lit(float(x)) for x in w])
        z = F.aggregate(
            F.zip_with(F.col("_x"), wlits, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")

        # ONE single-row aggregate per round: dim sum() columns over a
        # projected residual. The old shape posexploded every row dim
        # ways and shuffled a groupBy(i) — dim× the rows into an
        # exchange that partial aggregation then collapsed anyway; the
        # flat agg ships the same dim partial sums per partition with no
        # Generate and no Exchange at all (guide §2.3 "aggregate before
        # you shuffle" taken to its limit — there is nothing left to
        # shuffle). Per-row contribution arithmetic is identical; only
        # the (already partition-order-dependent) float summation order
        # changes, which the round-6 contract grid absorbs and the
        # grad_scale integer grid makes exactly order-free.
        def _contrib(i: int):
            # F.get (0-based) — NULL beyond a ragged row's width, like the
            # old posexplode which simply emitted no row there (ANSI
            # element_at would throw instead)
            c = F.col("_r") * F.get(F.col("_x"), i)
            if grad_scale is not None:
                c = F.round(c * F.lit(float(grad_scale))).cast("bigint")
            return F.sum(c).alias(f"_g{i}")

        row = (
            feats.select(resid.alias("_r"), "_x")
            .agg(F.count(F.lit(1)).alias("_n"), *[_contrib(i) for i in range(dim)])
            .first()
        )
        if n is None:
            n = int(row["_n"])
            if n == 0:
                # reachable with an explicit dim (the inference branch
                # above is skipped); without this the update divides by 0
                raise ValueError("logreg_train: empty input")
        grad = {i: row[f"_g{i}"] for i in range(dim)}
        if grad_scale is not None:
            # identical driver-side IEEE ops to the oracle's unrolled
            # update: (w - lr * (g_int / scale) / n), left-associative
            w = [
                wi - lr * ((grad.get(i, 0) or 0) / grad_scale) / n
                for i, wi in enumerate(w)
            ]
        else:
            # sum() is NULL when every contribution for a dim was NULL
            # (the old posexplode emitted no row there) — treat as 0
            w = [
                wi - lr * (grad.get(i) if grad.get(i) is not None else 0.0) / n
                for i, wi in enumerate(w)
            ]
    return w


def logreg_score(
    df: DataFrame,
    weights: Sequence[float],
    vec_col: str = "vector",
    out_col: str = "score",
) -> DataFrame:
    """Sigmoid scores under a trained model: pure codegen expression
    (weights as literals), map-only — the corpus-scoring pass."""
    wlits = F.array(*[F.lit(float(x)) for x in weights])
    z = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), wlits, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def binary_metrics(
    scored: DataFrame,
    label_col: str,
    score_col: str = "score",
    n_bins: int = 1000,
    threshold: float = 0.5,
    rational: bool = False,
) -> DataFrame:
    """Classifier evaluation in two bounded passes (public formulas):
    binned ROC-AUC and threshold confusion counts.

    AUC uses the rank-statistic form over *n_bins* score buckets —
    Σ_b pos_b · (neg_below_b + neg_b/2) / (P·N), i.e. the probability a
    random positive outscores a random negative with same-bucket pairs
    counted half (tie correction). Exact to 1/n_bins; the EXACT rank AUC
    needs a global sort, and bucketing is the scale path (the same trade
    ``functions/histogram.py`` makes). The only window runs over
    ≤ n_bins+1 count-partial rows; everything else is one aggregate
    pass. The AUC numerator is integers + halves (dyadic rationals
    summing exactly below 2^52), so the emitted double is bit-identical
    in any engine — no rounding needed.

    Buckets are ROUND-to-nearest-edge (``round(s·n_bins)``), not floor:
    floor flips across engines on grid-aligned scores (the double of
    0.12·100 is 11.999…), while scale-0 round is exact on identical
    doubles in every engine — the repo's determinism discipline.

    Returns ONE row: (auc, tp, fp, tn, fn, n_pos, n_neg).

    With ``rational=True`` the AUC emits as the EXACT integer pair
    (``auc_num2``, ``auc_den``) instead of the double quotient:
    ``auc = auc_num2 / auc_den`` with ``auc_num2 = Σ_b pos_b·(2·neg_below_b
    + neg_b)`` (doubling clears the half-tie term, so the numerator is a
    pure int64 sum — summation-order free) and ``auc_den = 2·P·N``. The
    projection is then ALL-INTEGER — the only column family never red
    under a bitwise cross-engine hash gate (rule 6, the t-closeness /
    ece_report discipline).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    y = F.col(label_col).cast("int")
    s = F.col(score_col)
    base = scored.select(
        F.round(s * n_bins).cast("int").alias("bin"),
        y.alias("_y"),
        (s >= F.lit(float(threshold))).alias("_hit"),
    )
    conf = base.agg(
        F.count_if(F.col("_y") == 1).alias("n_pos"),
        F.count_if(F.col("_y") == 0).alias("n_neg"),
        F.count_if((F.col("_y") == 1) & F.col("_hit")).alias("tp"),
        F.count_if((F.col("_y") == 0) & F.col("_hit")).alias("fp"),
        F.count_if((F.col("_y") == 0) & ~F.col("_hit")).alias("tn"),
        F.count_if((F.col("_y") == 1) & ~F.col("_hit")).alias("fn"),
    )
    bins = base.groupBy("bin").agg(
        F.count_if(F.col("_y") == 1).alias("np"),
        F.count_if(F.col("_y") == 0).alias("nn"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum_nn = F.coalesce(F.sum("nn").over(w), F.lit(0))
    if rational:
        num2 = bins.select(
            (F.col("np") * (2 * cum_nn + F.col("nn"))).cast("bigint").alias("_c")
        ).agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("_num2"))
        return conf.crossJoin(num2).select(
            F.col("_num2").alias("auc_num2"),
            (2 * F.col("n_pos") * F.col("n_neg")).cast("bigint").alias("auc_den"),
            "tp", "fp", "tn", "fn", "n_pos", "n_neg",
        )
    num = bins.select(
        (F.col("np") * (cum_nn + F.col("nn") / 2.0)).alias("_c")
    ).agg(F.sum("_c").alias("_num"))
    return conf.crossJoin(num).select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("_num") / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
        "tp", "fp", "tn", "fn", "n_pos", "n_neg",
    )


def calibration_bins(
    scored: DataFrame,
    label_col: str,
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram counts (Guo et al. 2017, "On Calibration of
    Modern Neural Networks", public): per confidence bin, how often the
    positive class actually occurs vs the mean predicted confidence —
    the eval behind temperature-scaling decisions for model-scored
    training data (an over-confident quality classifier silently skews
    a corpus mix).

    Bins are round-edge (``round(s·n_bins)``, the ``binary_metrics``
    discipline — identical doubles round identically in every engine;
    floor flips on grid-aligned products). Scores are expected on the
    1e-6 grid (``logreg_score`` round-6), so ``sum_score_micro`` =
    Σ round(s·1e6) is an exact int64 partial, and both emitted doubles
    (``pos_rate``, ``mean_conf_micro``) divide identical integers.

    One aggregate pass; output is ≤ n_bins+1 rows.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    y = F.col(label_col).cast("long")
    s = F.col(score_col)
    return (
        scored.groupBy(F.round(s * n_bins).cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("n_pos"),
            F.sum(F.round(s * 1_000_000).cast("bigint")).alias(
                "sum_score_micro"
            ),
        )
        .withColumn("pos_rate", F.col("n_pos") / F.col("n"))
        .withColumn("mean_conf_micro", F.col("sum_score_micro") / F.col("n"))
    )


def ece_report(
    scored: DataFrame,
    label_col: str,
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error as an EXACT integer rational (the
    t-closeness trick): ``ECE = Σ_b (n_b/N)·|acc_b − conf_b|`` =
    ``ece_num / ece_den`` with ``ece_num = Σ_b |n_pos_b·1e6 −
    sum_score_micro_b|`` and ``ece_den = N·1e6`` — no float enters the
    comparison path. One row: (n_bins, n_rows, ece_num, ece_den)."""
    g = calibration_bins(scored, label_col, score_col, n_bins)
    return g.agg(
        F.lit(n_bins).alias("n_bins"),
        F.sum("n").alias("n_rows"),
        F.sum(
            F.abs(F.col("n_pos") * F.lit(1_000_000) - F.col("sum_score_micro"))
        ).alias("ece_num"),
        (F.sum("n") * F.lit(1_000_000)).alias("ece_den"),
    )


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Inter-annotator agreement as an EXACT integer rational (Cohen
    1960, public) — the label-QA gate a human- or model-annotated
    training set runs before the labels are trusted:

        κ = (p_o − p_e) / (1 − p_e)
          = (n·Σ_agree − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k)

    so ``kappa_num = n·n_agree − pe_num`` and ``kappa_den = n² −
    pe_num`` with ``pe_num = Σ_k count_a(k)·count_b(k)`` — counts only,
    no float exists to diverge (rule 6). NULL labels are excluded
    (both-null rows are not "agreement"); a degenerate table where one
    label fills everything makes kappa_den 0 (κ undefined — the caller
    sees the zero denominator instead of a fabricated score).

    Scale shape: one agreement aggregate over the pair column plus one
    |labels|-sized marginal aggregate per rater joined on the label —
    shuffles carry label keys, never rows. Returns ONE row:
    (n, n_agree, pe_num, kappa_num, kappa_den).

    Capacity (ADVICE r5): ``kappa_den = n² − pe_num`` is computed in
    int64, which overflows for n ≥ ~3.04e9 labeled rows (√(2^63) ≈
    3.04e9); pe_num ≤ n² shares the bound. The single aggregated n is
    raise_error-guarded at that limit, so an over-capacity corpus fails
    loudly instead of wrapping — for larger annotation sets, sample or
    shard the agreement check per stratum.
    """
    a, b = F.col(rater_a), F.col(rater_b)
    base = df.filter(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    agree = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("_a") == F.col("_b")).alias("n_agree"),
    )
    ma = base.groupBy(F.col("_a").alias("_k")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    mb = base.groupBy(F.col("_b").alias("_k")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    pe = (
        ma.join(mb, "_k")
        .select((F.col("_ca") * F.col("_cb")).alias("_p"))
        .agg(F.coalesce(F.sum("_p"), F.lit(0)).alias("pe_num"))
    )
    n_ok = F.when(F.col("n") < F.lit(3_037_000_499), F.col("n")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cohen_kappa: n*n overflows int64 at n >= 3.04e9; n = "),
                F.col("n").cast("string"),
            )
        )
    )
    return agree.crossJoin(pe).select(
        "n",
        "n_agree",
        F.col("pe_num").cast("bigint").alias("pe_num"),
        (n_ok * F.col("n_agree") - F.col("pe_num"))
        .cast("bigint")
        .alias("kappa_num"),
        (n_ok * n_ok - F.col("pe_num"))
        .cast("bigint")
        .alias("kappa_den"),
    )
