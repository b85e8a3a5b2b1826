"""User-facing facade: the one-stop entry point a reference user switches
to.

    from sap_cta_data_pipeline_spark.engine import Engine

    eng = Engine.local(sf_dir="/root/testdata/sf0.01")
    eng.table("lineitem")                  # typed DataFrame
    eng.run("agg_pricing_summary")         # any SURVEY.md §2 operator
    eng.sql("SELECT count(*) FROM orders") # SQL over registered views
    eng.keys()                             # available operators
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import operators  # noqa: F401  (populates the registry)
from .catalog import TABLE_NAMES, load_table, register_views
from .registry import ORACLES, QUERIES
from .session import get_spark, tune


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = tune(spark)
        self.sf_dir = sf_dir
        self._views_registered = False

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "sap-cta-engine") -> "Engine":
        return cls(get_spark(app_name), sf_dir)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def tables(self) -> tuple[str, ...]:
        return TABLE_NAMES

    def keys(self) -> list[str]:
        """All implemented operator keys (SURVEY.md §2 inventory)."""
        return sorted(QUERIES)

    def run(self, key: str) -> DataFrame:
        if key not in QUERIES:
            raise KeyError(f"unknown operator {key!r}; see Engine.keys()")
        return QUERIES[key](self.spark, self.sf_dir)

    def oracle(self, key: str) -> str | None:
        """The DuckDB oracle SQL for a key (None for rows-only ops)."""
        return ORACLES.get(key)

    def sql(self, query: str) -> DataFrame:
        """SQL over the catalog tables, registered as temp views on first
        use (SURVEY.md §3.2 SQL-surface parity)."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)
