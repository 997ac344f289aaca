"""MetricViewCatalog — CREATE OR REPLACE / DROP semantics for metric views.

Spark has no ``CREATE VIEW … WITH METRICS`` DDL, so the catalog is ours:

* ``register(spec)`` ≡ ``CREATE OR REPLACE VIEW … WITH METRICS``
  (``macros/generate_metric_views.sql:80-91``). Re-registering an
  *unchanged* spec preserves materialization state — "incremental-friendly,
  doesn't destroy existing materialized view caches"
  (``macros/generate_metric_views.sql:78-79``); a changed spec invalidates
  the cached rollups (they no longer describe the data).
* ``drop(name, if_exists)`` ≡ ``DROP VIEW IF EXISTS``
  (``macros/drop_metric_views.sql:19-23``), removing rollup storage.
* ``describe(name)`` surfaces the v1.1 semantic metadata
  (``README.md:385-397``), including refresh handles directly — no
  pipeline-id regex scraping (cf. ``scripts/refresh_metric_views.py:39-74``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from .plans.rollup import MaterializationState
from .specs import MetricViewSpec


class CatalogError(KeyError):
    pass


@dataclass
class RegisteredView:
    spec: MetricViewSpec
    state: Optional[MaterializationState] = None  # physical rollup state


class MetricViewCatalog:
    def __init__(self) -> None:
        self._views: dict[str, RegisteredView] = {}

    def register(self, spec: MetricViewSpec) -> RegisteredView:
        """CREATE OR REPLACE: idempotent; unchanged spec keeps rollup state."""
        existing = self._views.get(spec.name)
        if existing is not None and existing.spec == spec:
            return existing  # state (and its caches) preserved
        rv = RegisteredView(spec=spec, state=None)
        self._views[spec.name] = rv
        return rv

    def drop(self, name: str, if_exists: bool = False) -> Optional[RegisteredView]:
        rv = self._views.pop(name, None)
        if rv is None and not if_exists:
            raise CatalogError(f"metric view {name!r} does not exist")
        return rv

    def get(self, name: str) -> RegisteredView:
        try:
            return self._views[name]
        except KeyError:
            raise CatalogError(f"metric view {name!r} is not registered") from None

    def __contains__(self, name: str) -> bool:
        return name in self._views

    def names(self) -> list[str]:
        return list(self._views)

    def describe(self, name: str) -> dict[str, Any]:
        rv = self.get(name)
        d = rv.spec.describe()
        mat = rv.spec.materialization
        d["materialized"] = {
            "schedule": mat.schedule if mat else None,
            "mode": mat.mode if mat else None,
            "baseline": rv.state.baseline if rv.state else None,
            "rollups": (
                {n: {"rows": b.n_rows} for n, b in rv.state.rollups.items()}
                if rv.state
                else {}
            ),
        }
        return d

    # ---- persistence (specs as YAML files, schema.yml-style) ----------

    def save(self, directory: str) -> list[str]:
        """Write every registered spec as ``<name>.yml`` under *directory*
        — the YAML-file workflow of the reference's ``models/schema.yml``
        as a standalone catalog export."""
        import os

        import yaml as _yaml

        from .specs import spec_to_yaml_doc

        os.makedirs(directory, exist_ok=True)
        paths = []
        for name, rv in self._views.items():
            p = os.path.join(directory, f"{name}.yml")
            with open(p, "w") as f:
                _yaml.safe_dump(spec_to_yaml_doc(rv.spec), f, sort_keys=False)
            paths.append(p)
        return paths

    def load(self, directory: str) -> list[str]:
        """Register every ``*.yml`` spec in *directory* (CREATE OR REPLACE
        semantics — unchanged specs keep their materialization state)."""
        import glob
        import os

        from .specs import MetricViewSpec

        loaded = []
        for p in sorted(glob.glob(os.path.join(directory, "*.yml"))):
            name = os.path.splitext(os.path.basename(p))[0]
            with open(p) as f:
                self.register(MetricViewSpec.from_yaml(f.read(), name=name))
            loaded.append(name)
        return loaded
