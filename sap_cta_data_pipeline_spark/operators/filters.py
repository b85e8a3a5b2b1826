"""§2-B Projections / filters / predicates.

All predicates here are Catalyst-pushable: conjunctions of comparisons,
IN-lists, BETWEEN, LIKE on scan columns reach the Parquet reader as
PushedFilters (asserted in tests/test_plans.py), so at 100 TB these scans
skip row groups via min/max statistics instead of reading and discarding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "project_select",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity,
      round(l_extendedprice * (1 - l_discount), 6)               AS net_price,
      round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
      l_returnflag
    FROM lineitem
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns — narrow (no shuffle), codegen'd."""
    li = t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        r6(net).alias("net_price"),
        r6(net * (1 + F.col("l_tax"))).alias("charged"),
        "l_returnflag",
    )


@query(
    "project_cast",
    oracle="""
    SELECT
      o_orderkey,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR)    AS order_date_str,
      CAST(o_orderkey AS VARCHAR)                   AS key_str,
      CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)   AS key_roundtrip,
      CAST(year(o_orderdate) AS BIGINT)             AS order_year
    FROM orders
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix: double→decimal (money), timestamp→date→string,
    bigint↔string round-trip, plus a computed year widened to BIGINT.
    The decimal is emitted as VARCHAR: Decimal cells materialize as Python
    objects vs DuckDB's float64 in pandas-land, which no value-hash compares
    stably (SURVEY.md §5.3)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date_str"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        bi(F.year("o_orderdate")).alias("order_year"),
    )


@query(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped conjunctive range filter — fully pushed to parquet."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_totalprice BETWEEN 150000 AND 200000)
      AND NOT o_orderpriority = '5-LOW'
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR / NOT / IN / BETWEEN boolean algebra."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P") | F.col("o_totalprice").between(150000, 200000))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_name LIKE '%widget%'
       OR (p_type LIKE 'PRO%' AND p_name LIKE '%gear')
       OR contains(p_name, 'blue bolt')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / startswith / endswith / contains on part strings."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%")
        | (F.col("p_type").startswith("PRO") & F.col("p_name").endswith("gear"))
        | F.col("p_name").contains("blue bolt")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "filter_null_logic",
    oracle="""
    SELECT
      l_returnflag,
      count(*)                                                      AS n,
      CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT)     AS n_zero_disc,
      CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero_disc,
      CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc_5pct,
      CAST(sum(CASE WHEN (nullif(l_discount, 0.0) = 0.05) IS NULL THEN 1 ELSE 0 END) AS BIGINT)          AS n_unknown_cmp
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def filter_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic probe: nulls synthesized with nullif (the data
    itself is null-free), IS NULL vs null-safe equality vs UNKNOWN."""
    li = t(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    one_if = lambda c: bi(F.sum(F.when(c, 1).otherwise(0)))  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        one_if(d.isNull()).alias("n_zero_disc"),
        one_if(d.isNotNull()).alias("n_nonzero_disc"),
        one_if(d.eqNullSafe(F.lit(0.05))).alias("n_disc_5pct"),
        one_if((d == 0.05).isNull()).alias("n_unknown_cmp"),
    )
