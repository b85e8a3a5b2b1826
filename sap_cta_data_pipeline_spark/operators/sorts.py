"""§2-F Sorts / limits / top-k.

The driver's value-hash is order-insensitive, so sort correctness is made
checkable by materializing the sort position as a row_number column with a
unique tiebreak (SURVEY.md §2-F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi
from ..registry import query


@query(
    "sort_multikey",
    oracle="""
    SELECT
      l_orderkey, l_linenumber, l_returnflag, l_shipdate,
      CAST(row_number() OVER (
        ORDER BY l_returnflag ASC, l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
      ) AS BIGINT) AS rn
    FROM lineitem
    WHERE l_partkey < 40
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ASC/DESC sort over a pruned sample, position materialized.
    The unpartitioned window is intentional here (sample is small); a global
    rank at 100 TB would use zipWithIndex-style range partitioning instead."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 40)
    w = Window.orderBy(
        F.col("l_returnflag").asc(),
        F.col("l_shipdate").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_shipdate",
        bi(F.row_number().over(w)).alias("rn"),
    )


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with a unique tiebreak. Spark plans this as
    TakeOrderedAndProject — per-partition heaps + driver merge, never a full
    sort (asserted in tests/test_plans.py); this is the scale-safe global
    top-k."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "sort_nulls_explicit",
    oracle="""
    SELECT
      s_suppkey,
      CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS pos_bal,
      CAST(row_number() OVER (
        ORDER BY (CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END) ASC NULLS LAST,
                 s_suppkey ASC
      ) AS BIGINT) AS rn
    FROM supplier
    """,
)
def sort_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (Spark defaults ASC→NULLS FIRST, DuckDB
    →NULLS LAST — never rely on defaults, SURVEY.md §5.3). Negative balances
    are mapped to NULL to synthesize the nulls. The global row_number is
    the operator's contract (supplier is dim-sized here); at 100 TB the
    same total order runs through the range-partitioned rank helper
    (functions/ranks.py: repartitionByRange + local row_number +
    broadcast offsets — NULLS LAST maps to a highest-range bucket)."""
    s = t(spark, sf_dir, "supplier")
    pos_bal = F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(F.col("s_acctbal"))
    out = s.select("s_suppkey", pos_bal.alias("pos_bal"))
    w = Window.orderBy(F.col("pos_bal").asc_nulls_last(), F.col("s_suppkey").asc())
    return out.select("s_suppkey", "pos_bal", bi(F.row_number().over(w)).alias("rn"))
