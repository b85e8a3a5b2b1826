"""Operator inventory (SURVEY.md §2). Importing this package populates the
registry with every implemented query + oracle pair."""

from . import aggregations, filters, joins, setops, sorts  # noqa: F401

__all__ = ["aggregations", "filters", "joins", "setops", "sorts"]
