"""LLM-data-pipeline operators (SURVEY.md §2.D): deduplication, similarity
search, text analysis, multimodal columns — each a DataFrame -> DataFrame
function designed for 100 TB scale (no driver-side collection, shuffles only
on bucketed/banded keys, Python only in Arrow-batched pandas UDFs)."""

from . import dedup, multimodal, similarity, text  # noqa: F401
