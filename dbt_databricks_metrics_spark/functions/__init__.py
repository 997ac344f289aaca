from .aggregates import Decomposition, decompose_aggregate  # noqa: F401
