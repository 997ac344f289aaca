"""[EXT] operators: LLM training-data pipeline surface (SURVEY §0, north
star) — dedup, similarity search, text analysis, sessionization,
multimodal plumbing."""

from . import dedup, multimodal, sessionize, similarity, textstats  # noqa: F401
