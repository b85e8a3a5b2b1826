"""Operator inventory (SURVEY.md §2). Importing this package populates the
registry with every implemented query + oracle pair."""

from . import aggregations  # noqa: F401

__all__ = ["aggregations"]
