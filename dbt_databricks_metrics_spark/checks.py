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
