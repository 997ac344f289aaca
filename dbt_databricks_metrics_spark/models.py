"""Model registry + DAG runner — the dbt graph, natively on Spark.

The reference arranges SQL models in a dependency DAG via ``ref()``
(``models/marts/fct_orders.sql:22-24``) and materializes each as a view
(``models/staging/stg_orders.sql:4-8``) or table
(``models/marts/fct_orders.sql:4-8``), executed in topological order by
``dbt run``. Here a *model* is a Python function ``(spark, ref) ->
DataFrame`` where ``ref(name)`` returns the materialized DataFrame of an
upstream model — lazy DataFrame lineage gives Catalyst the full intra-query
plan, so view-materialized chains collapse into one optimized plan.

Materializations:

* ``view`` — the DataFrame is registered as a temp view and flows on
  unmaterialized (recomputed per reader; Catalyst sees through it).
* ``table`` — CTAS semantics: the DataFrame is written to parquet under the
  run's warehouse directory and re-read, cutting lineage exactly like a
  physical table. At scale, pass ``partition_by`` so marts land
  partitioned for downstream partition pruning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

ModelFn = Callable[..., DataFrame]


class ModelError(ValueError):
    pass


@dataclass
class Model:
    name: str
    fn: ModelFn
    deps: tuple[str, ...] = ()
    materialized: str = "view"  # 'view' | 'table'
    partition_by: tuple[str, ...] = ()
    # (num_buckets, key_columns): hash-bucket the table on the join key so
    # equi-joins between tables bucketed the same way need NO shuffle on
    # either side — the co-location lever for fact-to-fact joins at scale
    bucket_by: Optional[tuple[int, tuple[str, ...]]] = None
    sort_by: tuple[str, ...] = ()  # within-bucket sort (skips the SMJ sort)
    description: Optional[str] = None
    # metric_view metadata attached via meta (schema.yml meta.metric_view)
    meta: dict[str, Any] = field(default_factory=dict)


class ModelRegistry:
    """Named models + ``ref()`` edges; topological execution.

    Mirrors the graph walk of ``macros/generate_metric_views.sql:19-29``:
    models carry optional ``meta['metric_view']`` blocks that the engine
    turns into metric-view registrations after a run (the ``on-run-end``
    hook semantics of ``dbt_project.yml:19-21``).
    """

    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def model(
        self,
        name: Optional[str] = None,
        *,
        deps: tuple[str, ...] | list[str] = (),
        materialized: str = "view",
        partition_by: tuple[str, ...] | list[str] = (),
        bucket_by: Optional[tuple[int, tuple[str, ...] | list[str]]] = None,
        sort_by: tuple[str, ...] | list[str] = (),
        description: Optional[str] = None,
        meta: Optional[dict[str, Any]] = None,
    ) -> Callable[[ModelFn], ModelFn]:
        """Decorator: register a model function ``(spark, ref) -> DataFrame``."""

        def deco(fn: ModelFn) -> ModelFn:
            mname = name or fn.__name__
            if materialized not in ("view", "table"):
                raise ModelError(f"model {mname!r}: materialized must be view|table")
            if bucket_by is not None and materialized != "table":
                raise ModelError(f"model {mname!r}: bucket_by requires materialized='table'")
            if mname in self._models:
                raise ModelError(f"duplicate model {mname!r}")
            self._models[mname] = Model(
                name=mname,
                fn=fn,
                deps=tuple(deps),
                materialized=materialized,
                partition_by=tuple(partition_by),
                bucket_by=(bucket_by[0], tuple(bucket_by[1])) if bucket_by else None,
                sort_by=tuple(sort_by),
                description=description,
                meta=dict(meta or {}),
            )
            return fn

        return deco

    def add(self, model: Model) -> None:
        if model.name in self._models:
            raise ModelError(f"duplicate model {model.name!r}")
        self._models[model.name] = model

    def __contains__(self, name: str) -> bool:
        return name in self._models

    def __getitem__(self, name: str) -> Model:
        try:
            return self._models[name]
        except KeyError:
            raise ModelError(f"unknown model {name!r}") from None

    def names(self) -> list[str]:
        return list(self._models)

    def topo_order(self) -> list[str]:
        """Kahn topo sort over declared deps; stable w.r.t. insertion order."""
        indeg = {n: 0 for n in self._models}
        for m in self._models.values():
            for d in m.deps:
                if d not in self._models:
                    raise ModelError(f"model {m.name!r} depends on unknown model {d!r}")
                indeg[m.name] += 1
        ready = [n for n, k in indeg.items() if k == 0]
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for m in self._models.values():
                if n in m.deps:
                    indeg[m.name] -= 1
                    if indeg[m.name] == 0:
                        ready.append(m.name)
        if len(out) != len(self._models):
            cyc = sorted(set(self._models) - set(out))
            raise ModelError(f"dependency cycle among models: {cyc}")
        return out


class Runner:
    """Executes a registry against a SparkSession (``dbt run`` equivalent)."""

    def __init__(
        self,
        spark: SparkSession,
        registry: ModelRegistry,
        warehouse_dir: Optional[str] = None,
    ) -> None:
        self.spark = spark
        self.registry = registry
        self.warehouse_dir = warehouse_dir
        self._built: dict[str, DataFrame] = {}

    def ref(self, name: str) -> DataFrame:
        """dbt ``ref()``: the materialized output of an upstream model."""
        if name not in self._built:
            raise ModelError(
                f"ref({name!r}) before it was built — declare it in deps=[...]"
            )
        return self._built[name]

    def run(
        self, select: Optional[list[str]] = None, parallel: bool = True
    ) -> dict[str, DataFrame]:
        """Build all (or selected + upstream) models in topo order.

        With *parallel* (default), models whose dependencies are satisfied
        build concurrently — Spark's scheduler accepts job submissions from
        multiple threads, so independent marts (e.g. ``fct_orders`` and
        ``fct_customer_summary``) materialize side by side instead of
        serially, exactly as dbt's ``threads:`` setting does against a
        warehouse. Dependency order is still honored via topological waves.
        """
        order = self.registry.topo_order()
        if select is not None:
            needed: set[str] = set()

            def visit(n: str) -> None:
                if n in needed:
                    return
                needed.add(n)
                for d in self.registry[n].deps:
                    visit(d)

            for s in select:
                visit(s)
            order = [n for n in order if n in needed]

        # topological waves: wave(m) = 1 + max(wave(deps)); every model in a
        # wave depends only on earlier waves, so a wave can run concurrently
        wave: dict[str, int] = {}
        for name in order:
            deps = [d for d in self.registry[name].deps]
            wave[name] = 1 + max((wave[d] for d in deps), default=-1)
        n_waves = max(wave.values(), default=-1) + 1
        for w in range(n_waves):
            members = [n for n in order if wave[n] == w]
            if len(members) == 1 or not parallel:
                for name in members:
                    self._built[name] = self._materialize(self.registry[name])
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=len(members)) as ex:
                    futures = {
                        n: ex.submit(self._materialize, self.registry[n])
                        for n in members
                    }
                    for n in members:  # deterministic insertion order
                        self._built[n] = futures[n].result()
        return dict(self._built)

    def _materialize(self, model: Model) -> DataFrame:
        df = model.fn(self.spark, self.ref)
        if model.materialized == "table":
            if not self.warehouse_dir:
                raise ModelError(
                    f"model {model.name!r} is table-materialized but no warehouse_dir set"
                )
            path = os.path.join(self.warehouse_dir, model.name)
            out = df
            if model.partition_by and not model.bucket_by:
                # AQE REBALANCE on the partition keys before a partitioned
                # write: without it every task opens a writer per partition
                # value (small-files explosion at cluster scale — 1000
                # tasks × K values = 1000K files); with it each partition
                # value lands in few tasks, and AQE still SPLITS a skewed
                # value across tasks (unlike a plain repartition, which
                # would bottleneck a hot partition on one task).
                out = df.hint("rebalance", *model.partition_by)
            writer = out.write.mode("overwrite")
            if model.partition_by:
                writer = writer.partitionBy(*model.partition_by)
            if model.bucket_by:
                # bucket metadata only survives through the session catalog,
                # so bucketed tables go through saveAsTable (external, with
                # an explicit path under this engine's warehouse dir)
                n, cols = model.bucket_by
                writer = writer.bucketBy(n, *cols).format("parquet")
                if model.sort_by:
                    writer = writer.sortBy(*model.sort_by)
                self.spark.sql(f"DROP TABLE IF EXISTS {model.name}")
                writer.option("path", path).saveAsTable(model.name)
                return self.spark.table(model.name)
            writer.parquet(path)
            df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(model.name)
        return df
