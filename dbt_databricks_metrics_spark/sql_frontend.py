"""Thin SQL front-end for ``MEASURE()`` queries.

Lets analysts run the exact query shape the reference documents
(``README.md:124-141``)::

    SELECT market_segment, MEASURE(total_revenue) AS revenue
    FROM mv_order_metrics
    WHERE order_status = 'F'          -- dim slice, applied pre-aggregation
    GROUP BY market_segment
    HAVING MEASURE(total_orders) > 5  -- measure filter, post-aggregation
    ORDER BY revenue DESC
    LIMIT 10

against our catalog. This is deliberately a *thin* parser over that shape —
arbitrary SQL around metric views (subqueries, joins of metric views, …)
is out of scope, matching how the reference exposes them. The parsed query
is executed through the engine's compiler, so rollup routing applies
identically to SQL and the Python API.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .engine import MetricEngine


class MeasureSQLError(ValueError):
    pass


_QUERY_RE = re.compile(
    r"^\s*select\s+(?P<items>.*?)\s+from\s+(?P<view>[A-Za-z_][\w.]*)"
    r"(?:\s+where\s+(?P<where>.*?))?"
    r"(?:\s+group\s+by\s+(?P<group>.*?))?"
    r"(?:\s+having\s+(?P<having>.*?))?"
    r"(?:\s+order\s+by\s+(?P<order>.*?))?"
    r"(?:\s+limit\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MEASURE_RE = re.compile(r"^measure\s*\(\s*([A-Za-z_]\w*)\s*\)$", re.IGNORECASE)
# any MEASURE(name) call inside a larger scalar expression, e.g.
# MEASURE(total_revenue) / MEASURE(total_orders)
_MEASURE_CALL_RE = re.compile(r"\bmeasure\s*\(\s*([A-Za-z_]\w*)\s*\)", re.IGNORECASE)


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def execute_measure_sql(engine: "MetricEngine", text: str) -> DataFrame:
    m = _QUERY_RE.match(text)
    if not m:
        raise MeasureSQLError(
            "expected: SELECT <dims | MEASURE(m) [AS alias]> FROM <metric_view> "
            "[WHERE ...] [GROUP BY ...] [HAVING ...] [ORDER BY ...] [LIMIT n]"
        )
    view_name = m.group("view").split(".")[-1]  # catalog.schema.name → name
    mv = engine.metric_view(view_name)

    dims: list[str] = []
    measures: list[str] = []
    # (kind, payload, alias): kind 'dim'/'measure' → payload = canonical
    # name; kind 'expr' → payload = scalar SQL over measure/dim columns
    # (MEASURE(x) calls already rewritten to the column name x)
    items: list[tuple[str, str, Optional[str]]] = []
    for item in _split_top_level(m.group("items")):
        alias = None
        am = re.match(r"^(.*?)\s+as\s+([A-Za-z_]\w*)$", item, re.IGNORECASE)
        if am:
            item, alias = am.group(1).strip(), am.group(2)
        mm = _MEASURE_RE.match(item)
        if mm:
            name = mm.group(1)
            if name not in measures:
                measures.append(name)
            items.append(("measure", name, alias))
        elif _MEASURE_CALL_RE.search(item):
            # scalar expression over MEASURE() calls (metric arithmetic):
            # SELECT MEASURE(total_revenue) / MEASURE(total_orders) AS aov
            for used in _MEASURE_CALL_RE.findall(item):
                if used not in measures:
                    measures.append(used)
            if alias is None:
                raise MeasureSQLError(
                    f"expression over MEASURE() needs an alias: {item!r} AS <name>"
                )
            items.append(("expr", _MEASURE_CALL_RE.sub(r"\1", item), alias))
        else:
            if not re.match(r"^[A-Za-z_]\w*$", item):
                raise MeasureSQLError(
                    f"select item {item!r}: only dimension names, MEASURE(name), "
                    f"and scalar expressions over MEASURE(...) are valid against "
                    f"a metric view"
                )
            dims.append(item)
            items.append(("dim", item, alias))

    group = m.group("group")
    if group:
        group_items = _split_top_level(group)
        resolved = []
        for g in group_items:
            if re.match(r"^\d+$", g):  # ordinal GROUP BY (fct_customer_summary style)
                idx = int(g) - 1
                if idx >= len(items):
                    raise MeasureSQLError(f"GROUP BY ordinal {g} out of range")
                kind, payload, _ = items[idx]
                if kind != "dim":
                    raise MeasureSQLError(
                        f"GROUP BY ordinal {g} refers to a measure select item"
                    )
                resolved.append(payload)
            else:
                resolved.append(g)
        if set(resolved) != set(dims):
            raise MeasureSQLError(
                f"GROUP BY {resolved} must match the non-measure select items {dims}"
            )
    elif dims:
        raise MeasureSQLError("bare dimensions in SELECT require GROUP BY")

    # HAVING filters the aggregated frame on MEASURE() values — it may
    # reference measures absent from SELECT, so compute those too and
    # project them away afterwards
    having = m.group("having")
    having_pred = None
    if having:
        for used in _MEASURE_CALL_RE.findall(having):
            if used not in measures:
                measures.append(used)
        having_pred = _MEASURE_CALL_RE.sub(r"\1", having)

    df, _route = mv.query_routed(dims, measures, where=m.group("where"))
    if having_pred is not None:
        df = df.filter(F.expr(having_pred))
    # project in SELECT-item order; expression items evaluate over the
    # aggregated frame (dims + canonical measure columns)
    df = df.select(
        *[
            F.expr(payload).alias(alias) if kind == "expr"
            else F.col(payload).alias(alias or payload)
            for kind, payload, alias in items
        ]
    )
    order = m.group("order")
    if order:
        order_cols = []
        for o in _split_top_level(order):
            om = re.match(r"^(\S+)(?:\s+(asc|desc))?$", o.strip(), re.IGNORECASE)
            if not om:
                raise MeasureSQLError(f"bad ORDER BY item {o!r}")
            col = F.col(om.group(1))
            if om.group(2) and om.group(2).lower() == "desc":
                col = col.desc()
            order_cols.append(col)
        df = df.orderBy(*order_cols)
    if m.group("limit"):
        df = df.limit(int(m.group("limit")))
    return df
