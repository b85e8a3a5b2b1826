"""Operator inventory (SURVEY.md §2). Importing this package populates the
registry with every implemented query + oracle pair."""

from . import (  # noqa: F401
    aggregations,
    filters,
    joins,
    multimodal_ops,
    pipeline,
    reshape,
    scalar_fns,
    semistructured,
    setops,
    sketches,
    similarity,
    sorts,
    sources,
    streaming_batch,
    text,
    text_analysis,
    udfs,
    windows,
)

__all__ = [
    "aggregations",
    "filters",
    "joins",
    "multimodal_ops",
    "pipeline",
    "reshape",
    "scalar_fns",
    "semistructured",
    "setops",
    "sketches",
    "similarity",
    "sorts",
    "sources",
    "streaming_batch",
    "text",
    "text_analysis",
    "udfs",
    "windows",
]
