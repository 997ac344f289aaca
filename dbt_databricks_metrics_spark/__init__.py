"""PySpark-native semantic-layer analytics engine.

A from-scratch re-implementation of the capabilities demonstrated by the
reference dbt + Databricks Unity Catalog Metric Views project
(``florent-brosse/dbt-databricks-metrics``), built Spark-first: model DAG →
DataFrames, metric views → spec dataclasses + a ``MEASURE()`` query
compiler over ``F.expr``, materialization → parquet rollups with
partial-state re-aggregation and a covering-set router, all optimized by
Catalyst.
"""

from .catalog import MetricViewCatalog
from .engine import MetricEngine, MetricView
from .models import Model, ModelRegistry, Runner
from .plans.compiler import MetricQuery, QueryCompiler, QueryError
from .specs import (
    Dimension,
    JoinSpec,
    Materialization,
    Measure,
    MetricViewSpec,
    RollupSpec,
    SpecError,
    WindowClause,
)

__all__ = [
    "Dimension",
    "JoinSpec",
    "Materialization",
    "Measure",
    "MetricEngine",
    "MetricQuery",
    "MetricView",
    "MetricViewCatalog",
    "MetricViewSpec",
    "Model",
    "ModelRegistry",
    "QueryCompiler",
    "QueryError",
    "RollupSpec",
    "Runner",
    "SpecError",
    "WindowClause",
]

__version__ = "0.1.0"
