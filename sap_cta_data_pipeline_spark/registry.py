"""Query registry — the bridge to the driver contract.

Every operator module registers its queries here with the ``@query``
decorator; ``__spark_entry__.py`` re-exports :data:`QUERIES` and
:data:`ORACLES` verbatim. Keys are the exact SURVEY.md §2 inventory names.

Each registered callable is wrapped to ``tune()`` the (driver-owned)
SparkSession first: session timezone / AQE / shuffle sizing are correctness
and perf preconditions we cannot assume the caller set.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle`` is the DuckDB-runnable ANSI
    SQL twin (omit only for legitimately engine-specific outputs — the
    driver then applies a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = textwrap.dedent(oracle).strip()
        return wrapped

    return deco
