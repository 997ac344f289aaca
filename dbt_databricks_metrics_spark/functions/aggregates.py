"""Aggregate-expression decomposition into partial states.

The reference's pre-aggregated rollups (``models/schema.yml:114-129``,
``README.md:336-352``) must answer queries over any *subset* of the rollup's
dimensions. That only works if the stored values are **partial aggregation
states** that re-aggregate correctly:

* ``sum → sum`` of partial sums
* ``count / count_if → sum`` of partial counts
* ``min/max → min/max`` of partials
* ``avg → (sum, count)`` pair, finalized as ``sum / count`` at query time
* ``hll_sketch_agg → hll_union_agg`` of partial DataSketches HLL sketches,
  finalized by whatever scalar wraps it (normally ``hll_sketch_estimate``)
  — this is what makes *distinct counts* routable through rollups: exact
  ``count(distinct x)`` can never be served from pre-aggregated state, but
  a mergeable sketch can (union of per-cell sketches ≡ sketch of the
  union), so ``hll_sketch_estimate(hll_sketch_agg(x))`` measures route,
  fold incrementally, and window (trailing-N-day distinct users) at
  rollup cost. At 100 TB this replaces a full-fact distinct scan with a
  |dim-combination|-row sketch merge.

The same decomposition powers the scale path for window measures (grain
pre-aggregation before windowing) and incremental refresh (fold new
partitions into partials). It is the Spark-native analogue of what the
Databricks warehouse does inside its metric-view optimizer.

Implementation: a small tokenizer finds the *outermost* aggregate calls in
the measure's SQL expression (nested parens consumed, string literals
skipped) and replaces each with references to generated partial columns.
Everything outside the aggregate calls (arithmetic, ``nullif``, casts, …)
becomes the *finalize* expression evaluated after merging. Expressions with
``DISTINCT`` aggregates or aggregate-free text are reported
non-decomposable (``None``) — the router then refuses to serve them from a
rollup and falls back to baseline/live (SURVEY §4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# merge function applied when re-aggregating a partial column
_AGG_FNS = {
    "sum": "sum",
    "count": "sum",
    "count_if": "sum",
    "min": "min",
    "max": "max",
    "avg": None,  # special-cased: (sum, count) pair
    "hll_sketch_agg": "hll_union",  # DataSketches HLL: union of sketches
}

_CALL_RE = re.compile(
    r"\b(sum|count|count_if|min|max|avg|hll_sketch_agg)\s*\(", re.IGNORECASE
)


def merge_column(fn: str, col: str):
    """The Spark ``Column`` that re-aggregates one partial column.

    *fn* is a ``Decomposition.merges`` value: ``sum``/``min``/``max`` for
    scalar partials, ``hll_union`` for HLL sketch partials (binary column
    merged with ``F.hll_union_agg`` — register-wise max, associative, so
    merged-estimate ≡ direct-estimate at equal lgConfigK). Usable both as
    a plain aggregate and as a window function (``.over(w)``).
    """
    from pyspark.sql import functions as F

    if fn == "hll_union":
        return F.hll_union_agg(F.col(col))
    return {"sum": F.sum, "min": F.min, "max": F.max}[fn](F.col(col))


@dataclass(frozen=True)
class Decomposition:
    """Partial-state plan for one measure expression.

    partials: ``(source_sql_expr, partial_col)`` computed at build/grain time
    merges:   ``partial_col -> merge_fn`` (sum|min|max) for re-aggregation
    finalize: SQL expr over the merged partial columns producing the measure
    """

    partials: tuple[tuple[str, str], ...]
    merges: dict[str, str]
    finalize: str

    @property
    def trivial(self) -> bool:
        """True when finalize is just the single partial column."""
        return len(self.partials) == 1 and self.finalize == self.partials[0][1]


def _find_matching_paren(s: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``s[open_idx] == '('`` (string-aware)."""
    depth = 0
    i = open_idx
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 2 if s[i] == "\\" else 1
        elif c == '"':
            i += 1
            while i < n and s[i] != '"':
                i += 2 if s[i] == "\\" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced parentheses in expression: {s!r}")


def decompose_aggregate(expr: str, prefix: str) -> Decomposition | None:
    """Decompose *expr* into partial states, or ``None`` if not possible.

    *prefix* namespaces the generated partial column names so multiple
    measures can coexist in one rollup table (e.g. ``_p_total_revenue_0``).
    """
    partials: list[tuple[str, str]] = []
    merges: dict[str, str] = {}
    seen: dict[str, str] = {}  # partial source expr -> existing column
    out: list[str] = []
    i = 0
    found_agg = False

    def partial_for(source_expr: str, merge_fn: str, suffix: str = "") -> str:
        # CSE: a repeated identical aggregate call maps to ONE stored
        # partial — essential for generated expressions that repeat
        # bucket counts (functions/histogram.py builds O(nb²) textual
        # occurrences of nb distinct counts)
        col = seen.get(source_expr)
        if col is None:
            col = f"{prefix}_{len(partials)}{suffix}"
            seen[source_expr] = col
            partials.append((source_expr, col))
            merges[col] = merge_fn
        return col

    while i < len(expr):
        m = _CALL_RE.search(expr, i)
        if not m:
            out.append(expr[i:])
            break
        fn = m.group(1).lower()
        open_idx = expr.find("(", m.end() - 1)
        close_idx = _find_matching_paren(expr, open_idx)
        arg = expr[open_idx + 1 : close_idx].strip()
        out.append(expr[i : m.start()])
        found_agg = True
        if re.match(r"(?i)^\s*distinct\b", arg):
            return None  # count(distinct x) does not decompose
        if fn == "avg":
            ps = partial_for(f"sum({arg})", "sum", "s")
            pc = partial_for(f"count({arg})", "sum", "c")
            out.append(f"({ps} / {pc})")
        else:
            out.append(partial_for(f"{fn}({arg})", _AGG_FNS[fn]))
        i = close_idx + 1
    if not found_agg:
        return None
    return Decomposition(
        partials=tuple(partials), merges=dict(merges), finalize="".join(out).strip()
    )
