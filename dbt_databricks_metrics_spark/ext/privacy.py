"""Aggregate privacy governance for training corpora ([EXT]).

k-anonymity (Sweeney 2002, public): a release is k-anonymous when every
combination of quasi-identifier values is shared by >= k rows — groups
below k single out individuals and must be suppressed or generalized.
This complements ``ext/redact.py`` (pattern-level PII removal) with the
AGGREGATE leak check a curation pipeline runs before exporting metadata
tables alongside a corpus. Distinct l-diversity (Machanavajjhala et al.
2007, public) closes k-anonymity's homogeneity gap: a group of >= k rows
that all share one sensitive value still discloses it.

Scale shape: one groupBy over the quasi-identifier columns (the same
shuffle a metric view's aggregation pays), then suppression is a
broadcast-able anti-join of the small-group keys — the data table is
never shuffled for suppression.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _anti_join_null_safe(
    df: DataFrame, keys: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """LEFT ANTI join matching NULL keys too (a quasi group whose key IS
    NULL must still be suppressible — a plain equi-join anti never
    matches NULL and would leak the flagged rows into the release)."""
    k = keys
    for c in cols:
        k = k.withColumnRenamed(c, f"__k_{c}")
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = e if cond is None else (cond & e)
    return df.join(F.broadcast(k), cond, "left_anti")


def k_anonymity_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """(quasi..., group_size, suppressed): every quasi-identifier
    combination with its row count and whether it violates k."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("group_size")
    ).withColumn("suppressed", F.col("group_size") < k)


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One summary row: group/row counts on both sides of the k line and
    the achieved anonymity level (min surviving group size; 0 when
    nothing survives)."""
    g = k_anonymity_groups(df, quasi_cols, k)
    return g.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("suppressed"), 1)).alias("n_groups_suppressed"),
        F.sum("group_size").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("suppressed"), F.col("group_size"))), F.lit(0)
        ).alias("n_rows_suppressed"),
        F.coalesce(
            F.min(F.when(~F.col("suppressed"), F.col("group_size"))), F.lit(0)
        ).alias("achieved_k"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Drop every row whose quasi-identifier group is smaller than k —
    the release then IS k-anonymous over those columns. The violating
    keys are a (small) anti-join side; the data table is scanned once."""
    small = (
        k_anonymity_groups(df, quasi_cols, k)
        .filter(F.col("suppressed"))
        .select(*quasi_cols)
    )
    return _anti_join_null_safe(df, small, list(quasi_cols))


def l_diversity_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """(quasi..., group_size, n_sensitive, low_diversity): distinct
    l-diversity (Machanavajjhala et al. 2007, public) — a k-anonymous
    group still leaks when everyone in it shares the same SENSITIVE
    value (homogeneity attack); each group must contain >= l distinct
    sensitive values. NULL sensitive values don't count as a value
    (count(DISTINCT) semantics, identical in ANSI SQL).

    Scale shape: one groupBy over the quasi columns with two partial-
    aggregating measures (count + distinct-count) — the distinct count
    expands to Spark's two-phase partial/final distinct aggregate, no
    extra full-table shuffle beyond the quasi-key one."""
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .withColumn("low_diversity", F.col("n_sensitive") < l)
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """One summary row: group/row counts on both sides of the l line and
    the achieved diversity level (min distinct-sensitive count among
    surviving groups; 0 when nothing survives). All-integer projection."""
    g = l_diversity_groups(df, quasi_cols, sensitive_col, l)
    return g.agg(
        F.lit(l).alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("low_diversity"), 1)).alias("n_groups_low"),
        F.sum("group_size").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("low_diversity"), F.col("group_size"))), F.lit(0)
        ).alias("n_rows_low"),
        F.coalesce(
            F.min(F.when(~F.col("low_diversity"), F.col("n_sensitive"))), F.lit(0)
        ).alias("achieved_l"),
    )


def suppress_low_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Drop every row whose quasi-identifier group has fewer than l
    distinct sensitive values — the release then IS (distinct)
    l-diverse over those columns. Like ``suppress_small_groups`` the
    violating keys broadcast to an anti-join; one data-table scan."""
    low = (
        l_diversity_groups(df, quasi_cols, sensitive_col, l)
        .filter(F.col("low_diversity"))
        .select(*quasi_cols)
    )
    return _anti_join_null_safe(df, low, list(quasi_cols))


def t_closeness_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_bucket_col: str,
    t: tuple = (1, 5),
) -> DataFrame:
    """(quasi..., group_size, emd_num, emd_den, distant): t-closeness
    (Li, Li & Venkatasubramanian 2007, public) for an ORDERED bucketed
    sensitive attribute — the distribution-shape check the l-diversity
    count misses (a group can span l distinct values yet still sit in
    the distribution's tail, leaking "this group is rich/sick/…").

    Earth-mover's distance between the group's and the global bucket
    distribution, for ordered equal-step buckets:
    ``EMD = sum_j |cum_p_j - cum_q_j| / (m-1)``. Computed as an EXACT
    integer rational: ``emd_num = sum_j |cumg_j*N - cumt_j*gs|``,
    ``emd_den = gs*N*max(m-1,1)`` (cumg/cumt = cumulative group/global
    counts, gs/N = group/total rows, m = bucket count) — no float ever
    appears, so the flag is engine- and layout-exact. ``distant`` ⇔
    ``emd_num * t_den > t_num * emd_den`` with ``t = (t_num, t_den)``.
    Magnitudes: emd_num <= m*gs*N — int64-safe through petabyte N for
    bounded group sizes; re-derive before trusting beyond ~1e18.

    Scale shape: the (quasi..., bucket) cell aggregation is the only
    data-sized exchange; the group and global distributions
    re-aggregate its |groups|·m rows. The cell subplan appears in three
    branches, which Spark's exchange-reuse dedupes at execution
    (verified: ReusedExchange nodes in the executed plan) — the source
    is scanned and shuffled once. The global cumulative window runs over m rows
    (single-partition by construction, bounded by bucket cardinality);
    the dense group×bucket grid is |groups|×m rows, never |rows|×m.
    """
    t_num, t_den = t
    if t_num < 0 or t_den <= 0:
        raise ValueError(f"t must be a non-negative rational, got {t!r}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    qc = list(quasi_cols)
    # a NULL bucket has no position on the ordered axis — rows with a
    # NULL sensitive bucket are excluded from BOTH distributions (they'd
    # otherwise inflate group_size/N without entering either cumulative,
    # yielding nonzero EMD for identical distributions — and Spark/ANSI
    # engines disagree on NULL ORDER BY placement)
    base = df.select(*qc, F.col(sensitive_bucket_col).alias("_b")).filter(
        F.col("_b").isNotNull()
    )
    # ONE source scan: the (quasi, bucket) cell table; the group and
    # global distributions re-aggregate its |groups|·m rows (map-side
    # combine makes the scan's shuffle the only data-sized exchange)
    cells = base.groupBy(*qc, "_b").agg(F.count(F.lit(1)).alias("_cn"))
    glob = cells.groupBy("_b").agg(F.sum("_cn").alias("_gn"))
    # m-row frames: single-partition windows/aggs are bounded by the
    # bucket cardinality, not the data size
    gw = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    glob_cum = glob.select(
        "_b", F.sum("_gn").over(gw).alias("_cumt")
    ).crossJoin(
        F.broadcast(
            glob.agg(
                F.sum("_gn").alias("_N"), F.count(F.lit(1)).alias("_m")
            )
        )
    )
    groups = cells.groupBy(*qc).agg(F.sum("_cn").alias("group_size"))
    # NULL-SAFE grid join: a group whose quasi key itself is NULL must
    # still pick up its cells (plain equi-join would miss them and flag
    # the group maximally distant)
    cells_r = cells
    for c in qc + ["_b"]:
        cells_r = cells_r.withColumnRenamed(c, f"__c_{c}")
    cond = None
    for c in qc + ["_b"]:
        e = F.col(c).eqNullSafe(F.col(f"__c_{c}"))
        cond = e if cond is None else (cond & e)
    dense = (
        groups.crossJoin(F.broadcast(glob_cum))
        .join(cells_r, cond, "left")
        .withColumn("_cn", F.coalesce(F.col("_cn"), F.lit(0)))
        .drop(*[f"__c_{c}" for c in qc + ["_b"]])
    )
    cw = (
        Window.partitionBy(*qc)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    contrib = dense.withColumn("_cumg", F.sum("_cn").over(cw)).withColumn(
        "_dev",
        F.abs(
            F.col("_cumg") * F.col("_N") - F.col("_cumt") * F.col("group_size")
        ),
    )
    return (
        contrib.groupBy(*qc, "group_size")
        .agg(
            F.sum("_dev").alias("emd_num"),
            F.max(
                F.col("group_size")
                * F.col("_N")
                * F.greatest(F.col("_m") - F.lit(1), F.lit(1))
            ).alias("emd_den"),
        )
        .withColumn(
            "distant",
            F.col("emd_num") * F.lit(t_den) > F.lit(t_num) * F.col("emd_den"),
        )
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_bucket_col: str,
    t: tuple = (1, 5),
) -> DataFrame:
    """One summary row: group/row counts on both sides of the t line.
    All-integer projection."""
    g = t_closeness_groups(df, quasi_cols, sensitive_bucket_col, t)
    return g.agg(
        F.lit(t[0]).alias("t_num"),
        F.lit(t[1]).alias("t_den"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("distant"), 1)).alias("n_groups_far"),
        F.sum("group_size").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("distant"), F.col("group_size"))), F.lit(0)
        ).alias("n_rows_far"),
    )


def suppress_distant_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_bucket_col: str,
    t: tuple = (1, 5),
) -> DataFrame:
    """Drop every row whose quasi-group's sensitive distribution sits
    farther than t (EMD) from the global one — the release then IS
    t-close. Broadcast anti-join; one data-table scan."""
    far = (
        t_closeness_groups(df, quasi_cols, sensitive_bucket_col, t)
        .filter(F.col("distant"))
        .select(*quasi_cols)
    )
    return _anti_join_null_safe(df, far, list(quasi_cols))
