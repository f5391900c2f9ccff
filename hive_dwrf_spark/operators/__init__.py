"""Pipeline + join operators beyond Spark's built-ins.

LLM-data-pipeline set (SURVEY.md §2.D): deduplication, similarity search,
text analysis, multimodal columns, deterministic sampling. Join/layout set (SURVEY.md §2.B): as-of
join, point-in-interval range join, bucketed co-located joins, skew
salting, clustered writes. Each is a DataFrame -> DataFrame function
designed for 100 TB scale (no driver-side collection, shuffles only on
bucketed/banded keys, Python only in Arrow-batched pandas UDFs)."""

from . import (  # noqa: F401
    asof,
    bucketing,
    curation,
    dedup,
    layout,
    multimodal,
    rangejoin,
    sampling,
    similarity,
    skew,
    text,
)
