"""dbt-style data tests (schema checks) for models.

The reference project declares ``test-paths: ["tests"]``
(``dbt_project.yml:9``) but ships none; dbt users still expect the four
built-in schema tests. Implemented Spark-first — each check compiles to one
aggregate over the model (all checks for a model fuse into a single scan
via one ``agg`` pass):

* ``not_null(column)``
* ``unique(column)``
* ``accepted_values(column, values)``
* ``relationships(column, to_model, to_column)`` — referential integrity
  (anti-join count)
* ``expression(sql)`` — arbitrary row predicate that must hold everywhere

``run_checks`` returns a result DataFrame-friendly list of
:class:`CheckResult`; ``MetricEngine.test()`` runs every check declared in
model ``meta['checks']`` (the ``dbt test`` analogue).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    model: str
    check: str
    column: Optional[str]
    passed: bool
    failures: int  # offending row count (0 when passed)


def _agg_checks(df: DataFrame, specs: list[tuple[str, Optional[str], Any]]) -> list[int]:
    """Evaluate all single-relation checks in ONE aggregate pass."""
    cols = []
    for kind, column, arg in specs:
        if kind == "not_null":
            cols.append(F.count_if(F.col(column).isNull()))
        elif kind == "accepted_values":
            vals = [F.lit(v) for v in arg]
            cols.append(
                F.count_if(~F.col(column).isin(*vals) | F.col(column).isNull())
            )
        elif kind == "expression":
            cols.append(F.count_if(~F.expr(arg) | F.expr(arg).isNull()))
        else:
            raise ValueError(f"not a single-pass check: {kind}")
    row = df.agg(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).first()
    return [row[f"c{i}"] for i in range(len(cols))]


def run_checks(
    model_name: str,
    df: DataFrame,
    checks: Sequence[dict[str, Any]],
    resolve=None,
) -> list[CheckResult]:
    """Run the declared checks against *df*.

    checks: list of dicts, e.g.::

        [{"not_null": "order_id"},
         {"unique": "order_id"},
         {"accepted_values": {"column": "order_status", "values": ["F","O","P"]}},
         {"relationships": {"column": "customer_id", "to": "stg_customers",
                            "field": "customer_id"}},
         {"expression": "total_price >= 0"}]
    """
    results: list[CheckResult] = []
    single_pass: list[tuple[str, Optional[str], Any]] = []
    single_meta: list[tuple[str, Optional[str]]] = []

    for c in checks:
        if "not_null" in c:
            single_pass.append(("not_null", c["not_null"], None))
            single_meta.append(("not_null", c["not_null"]))
        elif "accepted_values" in c:
            cfg = c["accepted_values"]
            single_pass.append(("accepted_values", cfg["column"], cfg["values"]))
            single_meta.append(("accepted_values", cfg["column"]))
        elif "expression" in c:
            single_pass.append(("expression", None, c["expression"]))
            single_meta.append(("expression", c["expression"]))
        elif "unique" in c:
            col = c["unique"]
            dupes = (
                df.groupBy(col)
                .count()
                .filter(F.col("count") > 1)
                .agg(F.coalesce(F.sum("count"), F.lit(0)))
                .first()[0]
            )
            results.append(
                CheckResult(model_name, "unique", col, dupes == 0, int(dupes))
            )
        elif "relationships" in c:
            cfg = c["relationships"]
            if resolve is None:
                raise ValueError("relationships check needs a resolver")
            parent = resolve(cfg["to"]).select(
                F.col(cfg["field"]).alias("_pk")
            )
            orphans = (
                df.filter(F.col(cfg["column"]).isNotNull())
                .join(parent, F.col(cfg["column"]) == F.col("_pk"), "left_anti")
                .count()
            )
            results.append(
                CheckResult(
                    model_name,
                    f"relationships→{cfg['to']}.{cfg['field']}",
                    cfg["column"],
                    orphans == 0,
                    int(orphans),
                )
            )
        else:
            raise ValueError(f"unknown check {c!r}")

    if single_pass:
        counts = _agg_checks(df, single_pass)
        for (kind, label), n in zip(single_meta, counts):
            results.append(CheckResult(model_name, kind, label, n == 0, int(n)))
    return results


# ---------------------------------------------------------------------------
# dbt `source freshness` parity


@dataclass(frozen=True)
class FreshnessResult:
    """One source's freshness verdict (dbt `source freshness` analogue)."""

    model: str
    ts_col: str
    max_loaded_at: Any  # newest timestamp seen (None on empty input)
    age_seconds: Optional[float]
    status: str  # 'pass' | 'warn' | 'error'


def source_freshness(
    model_name: str,
    df: DataFrame,
    ts_col: str,
    warn_after_s: float,
    error_after_s: Optional[float] = None,
    as_of: Any = None,
) -> FreshnessResult:
    """dbt's ``loaded_at_field`` freshness check, one aggregate pass.

    *as_of* anchors "now" (a timestamp literal/column expr); None uses the
    cluster clock. An EMPTY source is 'error' — dbt treats no-data as
    stale, and silently calling it fresh would mask a dead feed.
    """
    anchor = F.lit(as_of).cast("timestamp") if as_of is not None else F.current_timestamp()
    ts = F.col(ts_col).cast("timestamp")  # DATE loaded_at fields work too
    row = df.agg(
        F.max(ts).alias("_max_ts"),
        (anchor.cast("double") - F.max(ts).cast("double")).alias("_age"),
    ).first()
    max_ts, age = row["_max_ts"], row["_age"]
    if max_ts is None:
        return FreshnessResult(model_name, ts_col, None, None, "error")
    if error_after_s is not None and age > error_after_s:
        status = "error"
    elif age > warn_after_s:
        status = "warn"
    else:
        status = "pass"
    return FreshnessResult(model_name, ts_col, max_ts, float(age), status)


# ---------------------------------------------------------------------------
# dbt unit-test parity (dbt-core >= 1.8 `unit_tests:`)


@dataclass(frozen=True)
class UnitTestResult:
    model: str
    passed: bool
    missing: int  # expected rows absent from the actual output
    unexpected: int  # actual rows absent from the expectation
    actual_rows: int


def unit_test(
    spark,
    registry,
    model_name: str,
    given: "dict[str, DataFrame]",
    expect: DataFrame,
) -> UnitTestResult:
    """Run one model against MOCKED inputs and diff the output.

    dbt 1.8 unit-test semantics: every ``ref()`` the model makes resolves
    from *given* (a missing mock raises — a unit test must pin all
    inputs); the comparison is an order-insensitive exact multiset diff
    over the EXPECTATION's columns (the model may emit extra columns).
    Incremental models run in full-refresh mode (``is_incremental() ==
    False``). The diff is two ``exceptAll`` counts — null-safe and
    duplicate-aware, no driver-side row comparison.
    """
    from .models import IncrementalContext

    model = registry[model_name]

    def mock_ref(name: str) -> DataFrame:
        if name not in given:
            raise ValueError(
                f"unit test for {model_name!r}: ref({name!r}) has no mocked "
                f"input (given: {sorted(given)})"
            )
        return given[name]

    import inspect

    try:
        n_params = len(inspect.signature(model.fn).parameters)
    except (TypeError, ValueError):
        n_params = 2
    if n_params >= 3:
        ctx = IncrementalContext(is_incremental=False)
        actual = model.fn(spark, mock_ref, ctx)
    else:
        actual = model.fn(spark, mock_ref)
    missing_cols = [c for c in expect.columns if c not in actual.columns]
    if missing_cols:
        raise ValueError(
            f"unit test for {model_name!r}: output lacks expected columns "
            f"{missing_cols} (has {actual.columns})"
        )
    proj = actual.select(*expect.columns)
    missing = expect.exceptAll(proj).count()
    unexpected = proj.exceptAll(expect).count()
    return UnitTestResult(
        model=model_name,
        passed=missing == 0 and unexpected == 0,
        missing=int(missing),
        unexpected=int(unexpected),
        actual_rows=proj.count(),
    )


# ---------------------------------------------------------------------------
# dbt model contracts (dbt-core >= 1.5 `contract: enforced: true`)


def enforce_contract(
    model_name: str, df: DataFrame, contract: "dict[str, Any]"
) -> None:
    """Validate a model's output schema against its declared contract.

    dbt semantics: every declared column must exist with the declared
    data type, and (since the contract IS the interface) the output may
    not carry undeclared columns. Types compare on Spark's
    ``simpleString`` form, case-insensitive (``bigint``, ``string``,
    ``decimal(10,2)`` …). Violations raise ``ValueError`` at BUILD time
    — a contracted model never materializes with the wrong shape.
    """
    declared = contract.get("columns", ())
    if not declared:
        raise ValueError(f"model {model_name!r}: contract declares no columns")
    actual = {f.name: f.dataType.simpleString().lower() for f in df.schema.fields}
    problems: list[str] = []
    seen: set[str] = set()
    for col in declared:
        name, want = col["name"], str(col["data_type"]).strip().lower()
        seen.add(name)
        if name not in actual:
            problems.append(f"missing column {name!r} ({want})")
        elif actual[name] != want:
            problems.append(
                f"column {name!r}: declared {want}, actual {actual[name]}"
            )
    extra = [c for c in actual if c not in seen]
    if extra:
        problems.append(f"undeclared columns in output: {extra}")
    if problems:
        raise ValueError(
            f"model {model_name!r} violates its contract: " + "; ".join(problems)
        )
