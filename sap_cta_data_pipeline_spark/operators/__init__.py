"""Operator inventory (SURVEY.md §2). Importing this package populates the
registry with every implemented query + oracle pair."""

from . import (  # noqa: F401
    aggregations,
    filters,
    joins,
    scalar_fns,
    semistructured,
    setops,
    sorts,
    windows,
)

__all__ = [
    "aggregations",
    "filters",
    "joins",
    "scalar_fns",
    "semistructured",
    "setops",
    "sorts",
    "windows",
]
