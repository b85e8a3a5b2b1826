"""§2-G Set operations.

UNION ALL is shuffle-free (plan concatenation); the distinct variants add
one hash-dedup shuffle on the full row — at 100 TB prefer pre-aggregated
inputs or semi/anti-join reformulations where applicable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..registry import query


def _custkeys_by_status(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset union — duplicates (customers with many orders, and with
    both statuses) are preserved and value-hash-checked."""
    return _custkeys_by_status(spark, sf_dir, "O").unionAll(
        _custkeys_by_status(spark, sf_dir, "F")
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _custkeys_by_status(spark, sf_dir, "O")
        .union(_custkeys_by_status(spark, sf_dir, "F"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding both an 'O' and an 'F' order (set semantics)."""
    return _custkeys_by_status(spark, sf_dir, "O").intersect(
        _custkeys_by_status(spark, sf_dir, "F")
    )


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with 'O' orders but no 'F' orders (EXCEPT DISTINCT)."""
    return _custkeys_by_status(spark, sf_dir, "O").subtract(
        _custkeys_by_status(spark, sf_dir, "F")
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT r_regionkey, r_name, CAST(NULL AS BIGINT) AS extra
    FROM region
    UNION ALL
    SELECT r_regionkey, r_name, length(r_name) AS extra
    FROM region
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: two generations of the same feed whose
    columns differ in ORDER and PRESENCE are combined with
    ``unionByName(allowMissingColumns=True)`` — alignment is by name (the
    positional UNION ALL of plain SQL silently mis-associates reordered
    columns) and the missing column null-pads. This is the ingest-time
    twin of scan_schema_evolution, at the DataFrame level instead of the
    reader level."""
    r = t(spark, sf_dir, "region")
    gen1 = r.select("r_regionkey", "r_name")
    # generation 2: reordered columns + one new column
    gen2 = r.select(
        F.length("r_name").cast("long").alias("extra"),
        "r_name",
        "r_regionkey",
    )
    return gen1.unionByName(gen2, allowMissingColumns=True)
