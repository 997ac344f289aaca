from .compiler import MetricQuery, QueryCompiler, QueryError  # noqa: F401
