"""Routable approximate percentiles via fixed-range histogram partials.

Exact ``percentile``/``median`` can never be served from pre-aggregated
state (the router correctly forces them live — SURVEY §2.4
`distinct_median_measures`). But a FIXED-RANGE equi-width histogram is a
mergeable partial: per-bucket counts add across rollup cells, across
incremental folds, and across window frames. This module gives measures
that percentile-from-histogram capability WITHOUT touching the engine:

``hist_percentile(x, p, lo, hi, nb)`` is a *pseudo-aggregate* expanded
at spec-parse time (``specs.py``) into plain SQL — ``nb`` ``count_if``
bucket counts plus a CASE chain that linearly interpolates the p-th
quantile inside the first bucket whose cumulative count reaches
``p · total``. Because the expansion contains only standard aggregates:

* ``decompose_aggregate`` turns each bucket count into a rollup partial
  (merge = sum) automatically → the measure ROUTES;
* the window-measure machinery pre-aggregates buckets to the grain and
  sums them over frames → trailing-7d p50 works;
* incremental refresh folds bucket counts;
* the identical SQL runs in DuckDB → exact cross-engine oracle.

Accuracy contract: the estimate is exact to within one bucket width
(lo + i·w boundaries, linear interpolation inside); values outside
[lo, hi) clamp into the edge buckets, NULLs are ignored, and an empty
input yields NULL. Callers pick (lo, hi, nb) from domain knowledge — the
same contract as every fixed-range histogram (e.g. HDR-style latency
buckets).
"""

from __future__ import annotations

import re

from .aggregates import _find_matching_paren

_PSEUDO_RE = re.compile(r"\bhist_percentile\s*\(", re.IGNORECASE)


def _d(x: float) -> str:
    """Float constant as SQL that is DOUBLE in every engine — Spark parses
    bare `0.5` as DECIMAL (DuckDB as DOUBLE), which would silently switch
    the whole expression to decimal arithmetic on one side only."""
    return f"cast({float(x)!r} as double)"


def _bucket_condition(arg: str, lo: float, width: float, i: int, nb: int) -> str:
    """Membership condition for clamped bucket *i* (edge buckets absorb
    out-of-range values so total == count of non-null inputs)."""
    conds = []
    if i > 0:
        conds.append(f"({arg}) >= {_d(lo + i * width)}")
    if i < nb - 1:
        conds.append(f"({arg}) < {_d(lo + (i + 1) * width)}")
    if not conds:  # nb == 1: single bucket takes everything non-null
        conds.append(f"({arg}) is not null")
    return " and ".join(conds)


def hist_percentile_sql(arg: str, p: float, lo: float, hi: float, nb: int) -> str:
    """The pure-SQL expansion (standard aggregates only, engine-neutral)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"percentile p must be in (0, 1), got {p}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    if not 1 <= nb <= 64:
        raise ValueError(f"need 1 <= nb <= 64 buckets, got {nb}")
    w = (hi - lo) / nb
    counts = [f"count_if({_bucket_condition(arg, lo, w, i, nb)})" for i in range(nb)]
    total = " + ".join(counts)
    target = f"({_d(p)} * ({total}))"
    branches = []
    for i in range(nb):
        cum = " + ".join(counts[: i + 1])
        prev = " + ".join(counts[:i]) if i else "0"
        # interpolate inside bucket i: lo + w*(i + (target - prev)/ci)
        branches.append(
            f"when ({cum}) >= {target} and {counts[i]} > 0 then "
            f"{_d(lo)} + {_d(w)} * ({i} + ({target} - ({prev})) / {counts[i]})"
        )
    return f"(case {' '.join(branches)} else null end)"


def expand_pseudo_aggregates(expr: str) -> str:
    """Rewrite every ``hist_percentile(x, p, lo, hi, nb)`` call in *expr*
    into its plain-SQL expansion; other text passes through untouched."""
    out: list[str] = []
    i = 0
    while True:
        m = _PSEUDO_RE.search(expr, i)
        if not m:
            out.append(expr[i:])
            return "".join(out)
        open_idx = expr.find("(", m.end() - 1)
        close_idx = _find_matching_paren(expr, open_idx)
        inner = expr[open_idx + 1 : close_idx]
        parts = _split_args(inner)
        if len(parts) != 5:
            raise ValueError(
                f"hist_percentile needs (x, p, lo, hi, nb); got {inner!r}"
            )
        arg = parts[0]
        p, lo, hi = (float(x) for x in parts[1:4])
        nb = int(parts[4])
        out.append(expr[i : m.start()])
        out.append(hist_percentile_sql(arg, p, lo, hi, nb))
        i = close_idx + 1


def _split_args(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur).strip())
    return parts
