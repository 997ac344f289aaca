"""Metric-view spec model: the declarative semantic layer.

Re-expresses the Databricks Unity Catalog *metric view* YAML grammar used by
the reference project (``models/schema.yml:6-209``, grammar documented in
``README.md:143-353``) as plain Python dataclasses, plus the two parsing
modes implemented by the reference's Jinja macro
(``macros/generate_metric_views.sql:40-76``):

* **raw-YAML mode** — the full Databricks YAML document with a
  ``__SOURCE__`` placeholder substituted for the backing table reference
  (``macros/generate_metric_views.sql:42-43``).
* **structured mode** — ``dimensions`` / ``measures`` / ``filter`` given as
  structured properties; ``version`` defaults to ``0.1`` and a dimension's
  ``expr`` defaults to its ``name``
  (``macros/generate_metric_views.sql:45-76``).

Both normalize into one :class:`MetricViewSpec`. Expression fields
(``expr``, ``filter``, ``on``) are kept as *unparsed SQL strings*: the query
compiler hands them to Spark via ``F.expr`` so Catalyst sees the raw
expression tree and can optimize end-to-end (pushdown, pruning, codegen).

v1.1 semantic metadata (``display_name`` / ``comment`` / ``synonyms`` /
``format`` — ``models/schema.yml:144-209``, ``README.md:226-246``) is
carried on the dataclasses for ``describe()`` and has zero query-semantics
impact.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional

import yaml

SOURCE_PLACEHOLDER = "__SOURCE__"

# window `range:` grammar (README.md:250-278): "trailing <n> <unit>",
# "cumulative", or "current".
_TRAILING_RE = re.compile(
    r"^\s*trailing\s+(\d+)\s+(day|week|month|quarter|year|hour|minute|second)s?\s*$",
    re.IGNORECASE,
)

_SECONDS_PER = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


class SpecError(ValueError):
    """Raised for malformed or semantically invalid metric-view specs."""


@dataclass(frozen=True)
class MeasureFormat:
    """Presentation metadata only (``models/schema.yml:170-172``)."""

    type: str
    currency_code: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "MeasureFormat":
        return cls(type=str(d.get("type", "")), currency_code=d.get("currency_code"))


@dataclass(frozen=True)
class Dimension:
    """A named scalar expression usable in GROUP BY (``README.md:231-237``)."""

    name: str
    expr: str
    display_name: Optional[str] = None
    comment: Optional[str] = None
    synonyms: tuple[str, ...] = ()

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Dimension":
        name = d.get("name")
        if not name:
            raise SpecError(f"dimension missing 'name': {d!r}")
        return cls(
            name=str(name),
            # expr defaults to name (macros/generate_metric_views.sql:61-62)
            expr=str(d.get("expr", name)),
            display_name=d.get("display_name"),
            comment=d.get("comment"),
            synonyms=tuple(d.get("synonyms", ()) or ()),
        )


@dataclass(frozen=True)
class WindowClause:
    """One entry of a measure's ``window:`` list (``README.md:250-278``).

    ``range`` is one of:

    * ``trailing <n> <unit>`` — frame covering the trailing *n* units
      (inclusive of the current order value),
    * ``cumulative`` — unbounded-preceding running frame,
    * ``current`` — restrict to the current value of ``order``; when
      stacked with another window clause this acts as an extra partition
      key (the YTD pattern, ``README.md:268-277``).

    ``semiadditive: last`` collapses the ordered dimension by taking the
    most-recent frame's value (``models/schema.yml:97,103``);
    ``semiadditive: first`` takes the earliest frame's value (the natural
    complement — e.g. opening balance instead of closing balance).
    """

    order: str
    range: str
    semiadditive: str = "last"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "WindowClause":
        order = d.get("order")
        rng = d.get("range")
        if not order or not rng:
            raise SpecError(f"window clause needs 'order' and 'range': {d!r}")
        semi = str(d.get("semiadditive", "last")).lower()
        if semi not in ("last", "first"):
            raise SpecError(
                f"unsupported semiadditive mode {semi!r} (only 'last'/'first')"
            )
        clause = cls(order=str(order), range=str(rng).strip(), semiadditive=semi)
        clause.kind  # validate range grammar eagerly
        return clause

    @property
    def kind(self) -> str:
        r = self.range.lower()
        if r == "cumulative":
            return "cumulative"
        if r == "current":
            return "current"
        if _TRAILING_RE.match(r):
            return "trailing"
        raise SpecError(f"unsupported window range {self.range!r}")

    @property
    def trailing_parts(self) -> tuple[int, str]:
        m = _TRAILING_RE.match(self.range.lower())
        if not m:
            raise SpecError(f"not a trailing range: {self.range!r}")
        return int(m.group(1)), m.group(2).lower()

    def trailing_seconds(self) -> int:
        """Frame extent in seconds for time-unit ranges.

        ``trailing 7 day`` means a 7-day span *inclusive* of the current
        day: the frame lower bound is ``current - (7-1) days`` when the
        order column has day granularity.
        """
        n, unit = self.trailing_parts
        if unit not in _SECONDS_PER:
            raise SpecError(f"unit {unit!r} needs calendar arithmetic, not seconds")
        return n * _SECONDS_PER[unit]


@dataclass(frozen=True)
class Measure:
    """A named aggregate expression expanded at query time by ``MEASURE()``
    (``README.md:124-141``; defs ``models/schema.yml:83-103,154-209``)."""

    name: str
    expr: str
    windows: tuple[WindowClause, ...] = ()
    display_name: Optional[str] = None
    comment: Optional[str] = None
    synonyms: tuple[str, ...] = ()
    format: Optional[MeasureFormat] = None
    derived: bool = False  # expr references sibling MEASURE names, not columns

    @property
    def is_windowed(self) -> bool:
        return bool(self.windows)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Measure":
        name = d.get("name")
        expr = d.get("expr")
        if not name or not expr:
            raise SpecError(f"measure needs 'name' and 'expr': {d!r}")
        windows = tuple(WindowClause.from_dict(w) for w in d.get("window", ()) or ())
        derived = bool(d.get("derived", False))
        if derived and windows:
            raise SpecError(
                f"measure {name!r}: a derived measure cannot declare windows "
                f"(wrap windowed measures as dependencies instead)"
            )
        fmt = d.get("format")
        # pseudo-aggregates (hist_percentile) expand to plain SQL here, so
        # everything downstream — live expansion, rollup decomposition,
        # window grains, incremental folds, oracles — sees only standard
        # aggregates (functions/histogram.py)
        from .functions.histogram import expand_pseudo_aggregates

        return cls(
            name=str(name),
            expr=(
                str(expr).strip()
                if derived  # derived exprs reference measures, not columns
                else expand_pseudo_aggregates(str(expr).strip())
            ),
            windows=windows,
            display_name=d.get("display_name"),
            comment=d.get("comment"),
            synonyms=tuple(d.get("synonyms", ()) or ()),
            format=MeasureFormat.from_dict(fmt) if isinstance(fmt, dict) else None,
            derived=derived,
        )


@dataclass(frozen=True)
class JoinSpec:
    """A declared star/snowflake join (``README.md:282-300``).

    ``source`` names a registered model/table; ``on`` is a SQL predicate
    referencing the base relation as ``source`` and this join by its
    ``name`` (e.g. ``source.customer_id = customer.id``). ``joins`` nests
    snowflake hops whose ``on`` references the *parent* join's name
    (``README.md:290-294``); nested columns are addressed by dotted path
    (``customer.nation.name``).
    """

    name: str
    source: str
    on: str
    joins: tuple["JoinSpec", ...] = ()

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JoinSpec":
        # YAML 1.1 parses a bare `on:` key as boolean True — accept both
        name, source, on = d.get("name"), d.get("source"), d.get("on", d.get(True))
        if not name or not source or not on:
            raise SpecError(f"join needs 'name', 'source', 'on': {d!r}")
        nested = tuple(JoinSpec.from_dict(j) for j in d.get("joins", ()) or ())
        return cls(name=str(name), source=str(source), on=str(on), joins=nested)


@dataclass(frozen=True)
class RollupSpec:
    """One ``materialized_views:`` entry (``models/schema.yml:110-129``).

    ``type: unaggregated`` = baseline snapshot of the (filtered, joined)
    source; ``type: aggregated`` = pre-aggregated cube slice keyed by
    ``dimensions`` carrying partial states for ``measures``.
    """

    name: str
    type: str  # 'unaggregated' | 'aggregated'
    dimensions: tuple[str, ...] = ()
    measures: tuple[str, ...] = ()

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RollupSpec":
        name = d.get("name")
        typ = str(d.get("type", "")).lower()
        if not name or typ not in ("unaggregated", "aggregated"):
            raise SpecError(f"materialized view needs name + type in (unaggregated|aggregated): {d!r}")
        dims = tuple(str(x) for x in d.get("dimensions", ()) or ())
        meas = tuple(str(x) for x in d.get("measures", ()) or ())
        if typ == "aggregated" and not dims:
            raise SpecError(f"aggregated rollup {name!r} needs dimensions")
        return cls(name=str(name), type=typ, dimensions=dims, measures=meas)


@dataclass(frozen=True)
class Materialization:
    """``materialization:`` block (``models/schema.yml:104-129``)."""

    schedule: Optional[str] = None
    mode: Optional[str] = None
    materialized_views: tuple[RollupSpec, ...] = ()

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Materialization":
        return cls(
            schedule=d.get("schedule"),
            mode=d.get("mode"),
            materialized_views=tuple(
                RollupSpec.from_dict(x) for x in d.get("materialized_views", ()) or ()
            ),
        )


@dataclass(frozen=True)
class MetricViewSpec:
    """The full semantic model of one metric view."""

    name: str
    source: str
    version: str = "0.1"
    description: Optional[str] = None
    filter: Optional[str] = None
    dimensions: tuple[Dimension, ...] = ()
    measures: tuple[Measure, ...] = ()
    joins: tuple[JoinSpec, ...] = ()
    materialization: Optional[Materialization] = None

    def __post_init__(self) -> None:
        names = [d.name for d in self.dimensions] + [m.name for m in self.measures]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise SpecError(f"duplicate dimension/measure names: {sorted(dupes)}")
        dim_names = {d.name for d in self.dimensions}
        meas_names = {m.name for m in self.measures}
        windowed = {m.name for m in self.measures if m.is_windowed}
        for m in self.measures:
            orders = [w.order for w in m.windows]
            for o in orders:
                if o not in dim_names:
                    raise SpecError(
                        f"measure {m.name!r}: window order {o!r} is not a declared dimension"
                    )
        derived_names = {m.name for m in self.measures if m.derived}
        for m in self.measures:
            if not m.derived:
                continue
            refs = self.measure_refs(m.name)
            if not refs:
                raise SpecError(
                    f"derived measure {m.name!r} references no sibling "
                    f"measure — declare it as a plain measure instead"
                )
        # Derived-to-derived chains are allowed (dbt's derived metrics
        # compose, and avg_dollars = avg_cents / 100 is natural); only
        # CYCLES are refused — DFS over the measure_refs edges restricted
        # to derived siblings.
        def _cycle_from(start: str) -> Optional[list[str]]:
            path: list[str] = []
            on_path: set[str] = set()
            done: set[str] = set()

            def visit(n: str) -> Optional[list[str]]:
                if n in done:
                    return None
                path.append(n)
                on_path.add(n)
                for r in self.measure_refs(n):
                    if r not in derived_names:
                        continue
                    if r in on_path:
                        return path[path.index(r):] + [r]
                    found = visit(r)
                    if found:
                        return found
                path.pop()
                on_path.discard(n)
                done.add(n)
                return None

            return visit(start)

        for m in self.measures:
            if not m.derived:
                continue
            cycle = _cycle_from(m.name)
            if cycle:
                raise SpecError(
                    f"derived measures form a reference cycle: "
                    f"{' -> '.join(cycle)}"
                )
        if self.materialization:
            for r in self.materialization.materialized_views:
                for dname in r.dimensions:
                    if dname not in dim_names:
                        raise SpecError(f"rollup {r.name!r}: unknown dimension {dname!r}")
                for mname in r.measures:
                    if mname not in meas_names:
                        raise SpecError(f"rollup {r.name!r}: unknown measure {mname!r}")
                    if mname in windowed:
                        # window measures are computed on the fly, never
                        # materialized (README.md:431)
                        raise SpecError(
                            f"rollup {r.name!r}: window measure {mname!r} cannot be materialized"
                        )
                    if mname in derived_names:
                        raise SpecError(
                            f"rollup {r.name!r}: derived measure {mname!r} "
                            f"cannot be materialized — store its "
                            f"dependencies and the query router serves "
                            f"the derived value from them"
                        )

    # -- lookups -------------------------------------------------------

    def dimension(self, name: str) -> Dimension:
        for d in self.dimensions:
            if d.name == name:
                return d
        raise SpecError(f"metric view {self.name!r} has no dimension {name!r}")

    def measure(self, name: str) -> Measure:
        for m in self.measures:
            if m.name == name:
                return m
        raise SpecError(f"metric view {self.name!r} has no measure {name!r}")

    def measure_refs(self, name: str) -> tuple[str, ...]:
        """Sibling measure names a derived measure's expr references, in
        first-appearance order (empty for plain measures). Bare-identifier
        matches only — a token followed by ``(`` is a function call, and
        single-quoted string literals are blanked before the scan so a
        sibling name inside a literal (e.g. ``case ... then 'revenue_cents'``)
        never becomes a phantom dependency (ADVICE r4)."""
        m = self.measure(name)
        if not m.derived:
            return ()
        names = {mm.name for mm in self.measures}
        # blank literals with spaces (not deletion) so match positions
        # still index into an equivalent string for the '(' lookahead
        expr = re.sub(r"'[^']*'", lambda mo: " " * len(mo.group(0)), m.expr)
        out: list[str] = []
        for match in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            tok = match.group(0)
            rest = expr[match.end():].lstrip()
            if rest.startswith("("):
                continue  # function call, not a measure reference
            if tok in names and tok != name and tok not in out:
                out.append(tok)
        return tuple(out)

    def derived_topo_order(self, names) -> list[str]:
        """Kahn topo order of the given DERIVED measure names by their
        derived-to-derived reference edges — the projection order that
        lets a chain's tail resolve after its head. Shared by the batch
        compiler (apply_derived) and the streaming layer so the two
        cannot diverge. Cycles are refused at spec validation; raise
        defensively rather than loop if one ever appears."""
        pending = {
            n: {
                r for r in self.measure_refs(n)
                if self.measure(r).derived and r in set(names)
            }
            for n in names
        }
        order: list[str] = []
        while pending:
            ready = sorted(n for n, deps in pending.items() if not deps)
            if not ready:
                raise SpecError(
                    f"derived measures form a reference cycle: "
                    f"{sorted(pending)}"
                )
            for n in ready:
                order.append(n)
                del pending[n]
            for deps in pending.values():
                deps.difference_update(ready)
        return order

    @property
    def dimension_names(self) -> tuple[str, ...]:
        return tuple(d.name for d in self.dimensions)

    @property
    def measure_names(self) -> tuple[str, ...]:
        return tuple(m.name for m in self.measures)

    # -- parsing -------------------------------------------------------

    @classmethod
    def from_yaml(
        cls,
        text: str,
        *,
        name: str,
        source: Optional[str] = None,
        description: Optional[str] = None,
    ) -> "MetricViewSpec":
        """Raw-YAML mode: parse a full Databricks metric-view YAML doc.

        ``__SOURCE__`` is replaced with *source* before parsing
        (``macros/generate_metric_views.sql:42-43``).
        """
        if source is not None:
            text = text.replace(SOURCE_PLACEHOLDER, source)
        doc = yaml.safe_load(text)
        if not isinstance(doc, dict):
            raise SpecError(f"metric-view YAML must be a mapping, got {type(doc).__name__}")
        return cls._from_doc(doc, name=name, description=description)

    @classmethod
    def from_structured(
        cls,
        props: dict[str, Any],
        *,
        name: str,
        source: str,
        description: Optional[str] = None,
    ) -> "MetricViewSpec":
        """Structured mode (``macros/generate_metric_views.sql:45-76``):
        ``version`` defaults to '0.1'; dimension ``expr`` defaults to its
        ``name``; only filter/dimensions/measures supported."""
        doc: dict[str, Any] = {
            "version": str(props.get("version", "0.1")),
            "source": source,
        }
        if "filter" in props:
            doc["filter"] = props["filter"]
        if props.get("dimensions"):
            doc["dimensions"] = [
                {"name": d["name"], "expr": d.get("expr", d["name"])}
                for d in props["dimensions"]
            ]
        if props.get("measures"):
            doc["measures"] = [
                {"name": m["name"], "expr": m["expr"]} for m in props["measures"]
            ]
        return cls._from_doc(doc, name=name, description=description)

    @classmethod
    def _from_doc(
        cls, doc: dict[str, Any], *, name: str, description: Optional[str]
    ) -> "MetricViewSpec":
        if description is None:
            description = doc.get("comment")  # round-trip of spec_to_yaml_doc
        source = doc.get("source")
        if not source:
            raise SpecError("metric-view spec missing 'source'")
        if SOURCE_PLACEHOLDER in str(source):
            raise SpecError("unresolved __SOURCE__ placeholder — pass source=")
        mat = doc.get("materialization")
        return cls(
            name=name,
            source=str(source),
            version=str(doc.get("version", "0.1")),
            description=description,
            filter=(str(doc["filter"]).strip() if doc.get("filter") is not None else None),
            dimensions=tuple(Dimension.from_dict(d) for d in doc.get("dimensions", ()) or ()),
            measures=tuple(Measure.from_dict(m) for m in doc.get("measures", ()) or ()),
            joins=tuple(JoinSpec.from_dict(j) for j in doc.get("joins", ()) or ()),
            materialization=Materialization.from_dict(mat) if isinstance(mat, dict) else None,
        )

    def to_yaml_doc(self) -> dict[str, Any]:
        return spec_to_yaml_doc(self)

    # -- introspection (v1.1 semantic catalog, README.md:226-246) ------

    def describe(self) -> dict[str, Any]:
        """Metadata catalog for discovery — mirrors what ``DESCRIBE`` on a
        metric view would surface (``README.md:385-397``)."""
        return {
            "name": self.name,
            "version": self.version,
            "source": self.source,
            "description": self.description,
            "filter": self.filter,
            "dimensions": [
                {
                    "name": d.name,
                    "expr": d.expr,
                    "display_name": d.display_name,
                    "comment": d.comment,
                    "synonyms": list(d.synonyms),
                }
                for d in self.dimensions
            ],
            "measures": [
                {
                    "name": m.name,
                    "expr": m.expr,
                    "windowed": m.is_windowed,
                    "derived": m.derived,
                    "display_name": m.display_name,
                    "comment": m.comment,
                    "synonyms": list(m.synonyms),
                    "format": (
                        {"type": m.format.type, "currency_code": m.format.currency_code}
                        if m.format
                        else None
                    ),
                }
                for m in self.measures
            ],
            "materialized_views": [
                {
                    "name": r.name,
                    "type": r.type,
                    "dimensions": list(r.dimensions),
                    "measures": list(r.measures),
                }
                for r in (
                    self.materialization.materialized_views if self.materialization else ()
                )
            ],
        }


def spec_to_yaml_doc(spec: MetricViewSpec) -> dict:
    """Serialize a spec back to the Databricks metric-view YAML doc shape
    (inverse of :meth:`MetricViewSpec.from_yaml`; round-trip tested).

    The grammar has no top-level description field (descriptions live in
    the view DDL's COMMENT, ``macros/generate_metric_views.sql:84``) —
    ours is carried as ``comment:`` and restored on load.
    """

    def _dim(d: Dimension) -> dict:
        out: dict = {"name": d.name, "expr": d.expr}
        if d.display_name:
            out["display_name"] = d.display_name
        if d.comment:
            out["comment"] = d.comment
        if d.synonyms:
            out["synonyms"] = list(d.synonyms)
        return out

    def _meas(m: Measure) -> dict:
        out: dict = {"name": m.name, "expr": m.expr}
        if m.derived:
            out["derived"] = True
        if m.windows:
            out["window"] = [
                {"order": w.order, "range": w.range, "semiadditive": w.semiadditive}
                for w in m.windows
            ]
        if m.display_name:
            out["display_name"] = m.display_name
        if m.comment:
            out["comment"] = m.comment
        if m.synonyms:
            out["synonyms"] = list(m.synonyms)
        if m.format:
            fmt: dict = {"type": m.format.type}
            if m.format.currency_code:
                fmt["currency_code"] = m.format.currency_code
            out["format"] = fmt
        return out

    def _join(j: JoinSpec) -> dict:
        out: dict = {"name": j.name, "source": j.source, "on": j.on}
        if j.joins:
            out["joins"] = [_join(x) for x in j.joins]
        return out

    doc: dict = {"version": spec.version, "source": spec.source}
    if spec.description:
        doc["comment"] = spec.description
    if spec.filter:
        doc["filter"] = spec.filter
    if spec.joins:
        doc["joins"] = [_join(j) for j in spec.joins]
    if spec.dimensions:
        doc["dimensions"] = [_dim(d) for d in spec.dimensions]
    if spec.measures:
        doc["measures"] = [_meas(m) for m in spec.measures]
    if spec.materialization:
        mat: dict = {}
        if spec.materialization.schedule:
            mat["schedule"] = spec.materialization.schedule
        if spec.materialization.mode:
            mat["mode"] = spec.materialization.mode
        mat["materialized_views"] = [
            {
                "name": r.name,
                "type": r.type,
                **({"dimensions": list(r.dimensions)} if r.dimensions else {}),
                **({"measures": list(r.measures)} if r.measures else {}),
            }
            for r in spec.materialization.materialized_views
        ]
        doc["materialization"] = mat
    return doc
