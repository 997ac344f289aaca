"""As-of and interval (range) joins — temporal operators Spark lacks
natively, expressed as shuffle-lean DataFrame compositions (SURVEY §2.6
"custom operators" guidance: composition of existing ops before UDFs).

* :func:`asof_join` — for every left row, the single most recent right
  row at-or-before its timestamp (``direction="backward"``; ``"forward"``
  is the mirror), optionally within a tolerance. The classic use: stamp
  each event with the latest dimension version / last prior purchase /
  most recent model checkpoint. Implementation is the **union + window**
  recipe, NOT a range join: tag both sides, sort each ``by`` partition on
  (ts, side), and propagate the last-seen right payload onto left rows
  with ``last(ignorenulls)``. Cost: ONE shuffle on the ``by`` keys and
  one per-partition sort — same shape as a groupBy, no candidate-pair
  blowup, no broadcast requirement on either side. (Pandas users know
  this as ``merge_asof``; DuckDB as ``ASOF JOIN`` — which is the oracle.)

* :func:`interval_join` — match points to the intervals containing them
  (``start <= ts <= end``). A naive inequality join is O(|points| ×
  |intervals per key|); this bucketizes time: intervals explode to the
  fixed-width buckets they cover, points map to their single bucket, and
  the match becomes an equi-join on (by, bucket) + an exact containment
  filter. Data growth is bounded by interval_span/bucket_width (caller
  picks the width to match the data), and the join is shuffle-hash on
  narrow keys — the standard scale recipe for point-in-range.

Determinism: ``asof_join`` breaks right-side timestamp ties by the
ordering of ``right_tiebreak`` columns (default: descending over the
payload columns is NOT assumed — callers with tied timestamps should
pass an explicit tiebreak or pre-dedupe, as the contract query does).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    right_suffix: str = "_r",
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row
    at-or-before (backward) / at-or-after (forward) its ``on`` timestamp
    within the same ``by`` group. Unmatched left rows keep NULL right
    columns (left-join semantics); with ``tolerance_seconds``, matches
    farther than the tolerance are nulled out too.

    Right payload columns (everything but ``by`` + ``on``) are emitted
    with ``right_suffix``; the matched right timestamp is ``{on}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    payload = [c for c in right.columns if c not in (*by, on)]
    clash = [c for c in (*payload, on) if f"{c}{right_suffix}" in left.columns]
    if clash:
        raise ValueError(
            f"suffixed right columns collide with left: "
            f"{[f'{c}{right_suffix}' for c in clash]}"
        )
    # a right row with a NULL timestamp can never be "at or before"
    # anything — drop it up front (NULLS FIRST in the window order would
    # otherwise propagate its payload as the earliest match; DuckDB's
    # ASOF JOIN, the documented oracle, never matches NULL-ts rows)
    right = right.filter(F.col(on).isNotNull())

    # one unioned relation: left rows carry their own columns + NULL right
    # payload; right rows carry NULL left columns + payload. _side orders
    # right rows BEFORE left rows at equal timestamps → inclusive match.
    r_cols = [F.col(c).alias(f"{c}{right_suffix}") for c in (on, *payload)]
    l_cols = [F.col(c) for c in left.columns if c not in by]
    tagged_l = left.select(
        *by, F.col(on).alias("_ts"), F.lit(1).alias("_side"),
        *l_cols, *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{right_suffix}") for c in (on, *payload)],
    )
    tagged_r = right.select(
        *by, F.col(on).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *r_cols,
    )
    unioned = tagged_l.unionByName(tagged_r)

    # NULLS FIRST in BOTH directions: a left row with a NULL timestamp
    # must see no right rows at all (matches DuckDB ASOF, which never
    # matches NULL probes) — desc's default NULLS LAST would let it
    # absorb the last right payload in direction='forward'
    ts_ord = (
        F.col("_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_ts").desc_nulls_first()
    )
    tiebreak = [F.col(f"{c}{right_suffix}").asc_nulls_first() for c in right_tiebreak]
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_ord, F.col("_side").asc(), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        "_ts",
        "_side",
        *[F.col(c) for c in left.columns if c not in by],
        *[
            F.last(f"{c}{right_suffix}", ignorenulls=True).over(w).alias(f"{c}{right_suffix}")
            for c in (on, *payload)
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side", "_ts")
    if tolerance_seconds is not None:
        gap = (
            F.col(on).cast("double") - F.col(f"{on}{right_suffix}").cast("double")
            if direction == "backward"
            else F.col(f"{on}{right_suffix}").cast("double") - F.col(on).cast("double")
        )
        keep = gap <= F.lit(float(tolerance_seconds))
        out = out.select(
            *by,
            *[c for c in left.columns if c not in by],
            *[
                F.when(keep, F.col(f"{c}{right_suffix}")).alias(f"{c}{right_suffix}")
                for c in (on, *payload)
            ],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: rows of *points* matched to every interval
    with ``start <= ts <= end`` (inclusive), optionally key-scoped by
    ``by``. Returns points columns + interval columns (names must be
    disjoint apart from ``by``).

    Bucketized: the equi-join runs on (by, time-bucket) so no cross
    product forms; ``bucket_seconds`` trades replication (long intervals
    explode to more buckets) against candidate density.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by)
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, both sides have {overlap}")
    w = F.lit(int(bucket_seconds))

    def _bucket(c: Column) -> Column:
        return F.floor(c.cast("double") / w).cast("long")

    p = points.withColumn("_bkt", _bucket(F.col(point_ts)))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(_bucket(F.col(start_col)), _bucket(F.col(end_col)))
        ),
    )
    cond = [p["_bkt"] == iv["_bkt"], *[p[c] == iv[c] for c in by]]
    joined = p.join(iv, cond, "inner").where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    matched = joined.select(
        *[p[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in by],
    )
    if how == "inner":
        return matched
    # left: keep pointless points with NULL interval columns. The anti
    # join must use NULL-SAFE equality — a matched point carrying a NULL
    # in any column would otherwise fail the null-unsafe comparison and
    # reappear in the "missing" set (duplicating it in the output).
    seen = matched.select(*points.columns).distinct()
    cond = [points[c].eqNullSafe(seen[c]) for c in points.columns]
    missing = points.join(seen, cond, "left_anti")
    for c in intervals.columns:
        if c not in by:
            missing = missing.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(missing)


def point_in_time_features(
    spine: DataFrame,
    features: "dict[str, DataFrame]",
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    tolerance_seconds: Optional[float] = None,
    tiebreaks: "Optional[dict[str, Sequence[str]]]" = None,
) -> DataFrame:
    """Leakage-free training-set assembly — the feature-store
    point-in-time pattern: every SPINE row (label event) is joined with
    the latest value of each named feature table at-or-before its own
    timestamp, never a later one (future leakage is the classic offline/
    online skew bug). Each feature table's payload columns are emitted
    with a ``_<name>`` suffix; unmatched rows keep NULLs, and
    ``tolerance_seconds`` bounds staleness per table.

    Cost: one ``by``-keyed union+window shuffle PER feature table
    (|spine| + |table_i| rows each) — N tables = N bounded shuffles on
    the same key, no candidate-pair blowup, no broadcast requirement.

    ``tiebreaks`` maps a feature-table name to its ``right_tiebreak``
    columns — REQUIRED for determinism when that table can hold
    duplicate (by, on) rows (asof_join's documented tie contract;
    without it, which duplicate wins depends on partition layout).
    """
    if not features:
        raise ValueError("features must name at least one table")
    tiebreaks = tiebreaks or {}
    unknown = set(tiebreaks) - set(features)
    if unknown:
        raise ValueError(f"tiebreaks name unknown feature tables: {sorted(unknown)}")
    out = spine
    for name, tbl in features.items():
        out = asof_join(
            out,
            tbl,
            on=on,
            by=by,
            direction="backward",
            tolerance_seconds=tolerance_seconds,
            right_suffix=f"_{name}",
            right_tiebreak=tuple(tiebreaks.get(name, ())),
        )
    return out
