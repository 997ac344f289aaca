from .aggregates import Decomposition, decompose_aggregate, merge_column  # noqa: F401
from .histogram import expand_pseudo_aggregates, hist_percentile_sql  # noqa: F401
