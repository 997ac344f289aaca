"""[EXT] operators: LLM training-data pipeline surface (SURVEY §0, north
star) — dedup (exact/MinHash/SimHash/winnowing/SemDeDup), similarity
search + k-means, text analysis + corpus-LM scoring, sessionization,
contamination, sampling/packing/chunking, redaction, quantization,
multimodal plumbing."""

from . import (  # noqa: F401
    chunking,
    contamination,
    dedup,
    kmeans,
    lm,
    multimodal,
    packing,
    pipeline,
    profile,
    quantize,
    redact,
    sampling,
    search,
    semdedup,
    sessionize,
    similarity,
    textstats,
    winnow,
)
