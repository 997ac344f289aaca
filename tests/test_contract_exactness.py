"""Bit-exactness guarantees for the avg-measure contract family.

VERDICT r2 #1: ``customer_metrics`` failed the driver's exact-value hash in
rounds 1 AND 2 while passing every local mirror, because round(avg, 4) of a
non-grid-aligned quotient can flip on a host-dependent last-bit difference.
The round-3 contracts derive every quotient from exact int64 partials, which
makes the emitted doubles bit-identical REGARDLESS of summation order.
These tests pin that property:

1. the exact integer partials are invariant under adversarial repartitioning
   (different accumulation order -> same int64 sums, by construction);
2. the contract projections equal the DuckDB oracle values EXACTLY
   (``==`` on floats, no tolerance) — the same bar the driver's hash gate
   applies;
3. every MV-agreement tolerance boolean is True (non-vacuous: a broken
   MEASURE() expansion would flip it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

AVG_FAMILY = [
    "customer_metrics",
    "measure_by_dim",
    "measure_global",
    "measure_sql",
    "measure_expr_sql",
    "lineitem_pricing",
    "routed_pricing",
]

# contracts whose query fn takes with_ok=True to ALSO emit the MV-vs-exact
# tolerance booleans (dropped from the driver-hashed projection in round 4:
# raw float aggregates inside hashed booleans were the r03 escape class)
WITH_OK_FNS = {
    "customer_metrics": "_q_customer_metrics",
    "measure_by_dim": "_q_measure_by_dim",
    "measure_global": "_q_measure_global",
    "measure_sql": "_q_measure_sql",
    "measure_expr_sql": "_q_measure_expr_sql",
    "lineitem_pricing": "_q_lineitem_pricing",
    "routed_pricing": "_q_routed_pricing",
    "revenue_by_nation": "_q_revenue_by_nation",
    "star_segment_year": "_q_star_segment_year",
    "revenue_by_brand": "_q_revenue_by_brand",
    "metric_anomalies": "_q_metric_anomalies",
    "metric_anomalies_robust": "_q_metric_anomalies_robust",
    "drift_report": "_q_drift_report",
    "ab_welch": "_q_ab_welch",
}


def _strict_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=lambda t: tuple(str(v) for v in t))


def _oracle_rows(duck, sql, spark_cols):
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == spark_cols
    idx = [dcols.index(c) for c in spark_cols]
    rows = [tuple(r[i] for i in idx) for r in res.fetchall()]
    return sorted(rows, key=lambda t: tuple(str(v) for v in t))


@pytest.mark.parametrize("name", AVG_FAMILY)
def test_contract_bit_exact_vs_oracle(spark, sf_dir, duck, name):
    df = entrymod.queries()[name](spark, sf_dir)
    cols, srows = _strict_rows(df)
    orows = _oracle_rows(duck, entrymod.oracle_sql()[name], cols)
    assert len(srows) == len(orows)
    for a, b in zip(srows, orows):
        # EXACT equality, floats included — the driver's hash bar
        assert a == b, f"{name}: {a} != {b}"


@pytest.mark.parametrize("name", sorted(WITH_OK_FNS))
def test_tolerance_booleans_non_vacuous(spark, sf_dir, name):
    fn = getattr(entrymod, WITH_OK_FNS[name])
    df = fn(spark, sf_dir, with_ok=True)
    ok_cols = [c for c in df.columns if c.endswith("_ok")]
    assert ok_cols, f"{name} carries no MV-agreement boolean"
    agg = df.agg(*[F.min(F.col(c).cast("int")).alias(c) for c in ok_cols])
    row = agg.collect()[0]
    for c in ok_cols:
        assert row[c] == 1, f"{name}.{c} is not uniformly true"


@pytest.mark.parametrize("name", sorted(WITH_OK_FNS))
def test_hashed_projection_has_no_ok_booleans(spark, sf_dir, name):
    """The driver-hashed projection (default mode) must not carry any
    tolerance boolean — the r03 postmortem rule (BASELINE.md)."""
    df = entrymod.queries()[name](spark, sf_dir)
    leaked = [c for c in df.columns if c.endswith("_ok")]
    assert not leaked, f"{name} hashes tolerance booleans: {leaked}"


def test_integer_partials_order_invariant(spark, sf_dir):
    """Same exact-partial aggregation under three different partitionings
    of the input must produce IDENTICAL int64 sums — the property that
    makes the contract immune to host/partition-split differences."""
    eng = entrymod._engine(spark, sf_dir)
    base = eng.ref("fct_customer_summary")

    def partials(df):
        cents = F.round(F.col("total_spent") * 100).cast("bigint")
        ratio = F.col("total_orders") / F.expr(
            "nullif(datediff(last_order_date, first_order_date), 0)"
        )
        out = (
            df.groupBy("market_segment")
            .agg(
                F.sum(cents).alias("sum_cents"),
                F.sum(F.col("total_orders").cast("bigint")).alias("sum_orders"),
                F.sum(F.round(ratio * 1000000.0).cast("bigint")).alias("sum_freq_u"),
            )
            .collect()
        )
        return sorted([tuple(r) for r in out])

    plain = partials(base)
    shuffled = partials(base.repartition(7))
    keyed = partials(base.repartition(13, "customer_id"))
    assert plain == shuffled == keyed


# ---------------------------------------------------------------------------
# Round-6 guard (VERDICT r5 #1/#2): the four-round driver-red mystery was
# the ORACLE's DuckDB result types, not the engine and not FP. DuckDB 1.x
# types an un-cast sum(BIGINT) as HUGEINT/int128, and the driver's fetch
# path serializes HUGEINT differently from Spark int64 — hash mismatch on
# identical values. Proof: the CORRECTNESS_r05 red set (8 contracts) equals
# the HUGEINT-bearing-oracle set EXACTLY, and the probe twins inverted the
# FP hypothesis (pricing_probe_int red, pricing_probe_double green).
# The rule that actually holds: every oracle's RESULT schema must stay in
# DuckDB's fetch-stable type set (int64-and-below, double, varchar, date,
# timestamp, boolean, lists thereof) — never HUGEINT/UHUGEINT/DECIMAL.
# Doubles are hash-safe; the r5 "no doubles in hashed projections" rule is
# retired. Spark-side leaf types are unconstrained beyond matching the
# oracle (the driver checks schema equality separately).
# ---------------------------------------------------------------------------

_FETCH_UNSTABLE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def test_prefix_is_50_known_queries(spark):
    qs = entrymod.queries()
    prefix = entrymod._DRIVER_PREFIX
    assert len(prefix) == 50, "driver samples exactly the first 50"
    assert all(n in qs for n in prefix)


def test_prefix_rotates_oldest_contracts():
    """Rotation-discipline guard (VERDICT r6 #5, bound adjusted): the
    driver samples exactly 50 contracts per round, so with ~175
    contracts (ceil(n/50) = 4 up to n = 200) the tightest enforceable
    staleness bound is 4 rounds — the 2-round bound the r6 VERDICT
    suggested is arithmetically infeasible. This guard pins the greedy
    oldest-first discipline that achieves the 4-round bound:

    1. every contract that has NEVER received a driver row must be in
       the prefix (first-timers can't wait);
    2. every contract whose latest driver row is >= 3 rounds old at
       prefix-build time (i.e. would exceed the 4-round bound if
       skipped this round) must be in the prefix;
    3. if (1)+(2) don't fill all 50 slots, that's fine — the remainder
       is free for re-sampling reshaped or watch-listed contracts.

    Round-boundary defusal (VERDICT r9 #3): the driver writes
    CORRECTNESS_r{N} AFTER the builder's final commit, so for three
    rounds running a fresh clone of a just-closed round opened with this
    guard red — the committed prefix was validated against a history one
    file NEWER than the one it was built from. The guard now checks the
    prefix against the history AS OF BUILD TIME: when the newest
    correctness file already reflects the committed prefix (its key set
    contains the prefix — the same post-driver predicate bench.py uses),
    that file is excluded from the staleness computation. The discipline
    is still enforced at prefix-build time (pre-driver, nothing is
    excluded), and a prefix that ignores its own build-time backlog
    still fails.
    """
    import bench

    last, newest_keys = bench.correctness_last_rows()
    if not last:
        pytest.skip("no driver correctness history present")
    if set(entrymod._DRIVER_PREFIX) <= newest_keys:
        # post-driver: this prefix's own round already landed — validate
        # against the history the prefix was actually built from
        last, _ = bench.correctness_last_rows(exclude_newest=True)
        if not last:
            pytest.skip("no pre-prefix correctness history present")
    max_round = max(last.values())
    prefix = set(entrymod._DRIVER_PREFIX)
    contracts = set(entrymod.queries())

    never = sorted(contracts - set(last))
    stale = sorted(
        k for k in contracts if k in last and last[k] <= max_round - 3
    )
    required = never + [k for k in stale if k not in never]
    assert len(required) <= 50, (
        f"{len(required)} contracts need rows this round but the driver "
        f"samples only 50 — rotation fell behind; shrink the backlog"
    )
    missing = [k for k in required if k not in prefix]
    assert not missing, (
        f"prefix violates oldest-first rotation — never-sampled or "
        f">=3-round-stale contracts left out: {missing}"
    )


@pytest.mark.parametrize("name", ["pricing_probe_int", "pricing_probe_double"])
def test_retired_probe_twins_stay_bit_exact(spark, sf_dir, duck, name):
    """VERDICT r9 #4: the diagnostic probe twins are retired from the
    driver-sampled contract set (their r4-r5 bisect job is done and the
    no-HUGEINT invariant is pinned statically over all live oracles by
    test_no_oracle_result_type_is_fetch_unstable), but their bit-exactness
    — including the double projection that was the r5 signal — stays
    asserted here at the same EXACT-equality bar the driver hash applied."""
    df = entrymod.retired_queries()[name](spark, sf_dir)
    cols, srows = _strict_rows(df)
    orows = _oracle_rows(duck, entrymod.retired_oracle_sql()[name], cols)
    assert len(srows) == len(orows)
    for a, b in zip(srows, orows):
        assert a == b, f"{name}: {a} != {b}"


def test_retired_contracts_not_in_live_registry():
    """Retired names must not re-enter queries()/oracle_sql() silently —
    the rotation accounting (bench._max_row_age_rounds, the guard above)
    assumes they are gone."""
    live_q, live_o = set(entrymod.queries()), set(entrymod.oracle_sql())
    retired = set(entrymod.retired_queries())
    assert retired == set(entrymod.retired_oracle_sql())
    assert not (retired & live_q), retired & live_q
    assert not (retired & live_o), retired & live_o


def _walk_duck_type(t):
    """Flatten a DuckDB logical type to its textual leaves (covers
    LIST/STRUCT via the str form, e.g. 'BIGINT[]', 'STRUCT(a HUGEINT)')."""
    return str(t).upper()


def test_no_oracle_result_type_is_fetch_unstable(duck):
    """THE guard for the r1-r5 driver-red class: no oracle may produce a
    HUGEINT / UHUGEINT / DECIMAL result column (the types whose driver
    fetch-path representation diverges from Spark int64/double). Binds
    and type-checks ALL oracle strings — prefix and beyond — so the
    class cannot re-enter through any contract."""
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(u in _walk_duck_type(t) for u in _FETCH_UNSTABLE)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"fetch-unstable oracle result types (wrap the aggregate in "
        f"CAST(... AS BIGINT) / AS DOUBLE): {offenders}"
    )


def test_bench_reports_bounded_row_age():
    """r9 (VERDICT r7 #7 / r8 #2): bench.py emits max_row_age_rounds in
    its parsed tail, and the greedy oldest-first rotation keeps it <= 3."""
    import bench

    age = bench._max_row_age_rounds()
    if age is None:
        pytest.skip("no driver correctness history present")
    assert age <= 3, f"rotation fell behind: max contract row age {age}"
