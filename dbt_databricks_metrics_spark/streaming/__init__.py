"""Structured Streaming surfaces: incremental rollup folds and CDC
retraction folds (``refresh``), stateful sessionization and streaming
dedup (``sessions``), stream-stream/stream-static joins (``joins``),
and the streaming metric layer (``metric_stream``)."""

from .metric_stream import streaming_metric_view

__all__ = ["streaming_metric_view"]
