"""§2 round-2 addendum — subquery surfaces (EXISTS / IN / scalar / correlated).

The reference's query surface (SURVEY.md §2-B/C) implies the standard SQL
subquery forms; a user of any analytics engine reaches for them daily. On
Spark each form has a canonical *decorrelated* physical shape — we declare
that shape directly with the DataFrame API so the plan is the one Catalyst
would rewrite to anyway, with no correlated re-execution per outer row:

- EXISTS / IN       → LEFT SEMI join (broadcast when the subquery side is
  small, shuffle-hash otherwise; no row duplication ever);
- NOT EXISTS        → LEFT ANTI join (see join_anti for the §2-C twin);
- scalar subquery   → one-row aggregate crossJoin(broadcast(...)) — the
  scalar is computed once and shipped to every executor, never per row;
- correlated aggregate (TPC-H Q17 shape) → window aggregate over the
  correlation key, which is Spark's own decorrelation strategy: one shuffle
  by the key instead of |outer| subquery executions.

At 100 TB the semi/anti forms shuffle only the outer table's join column
set (column pruning), the scalar form shuffles nothing but the one-row
aggregate, and the windowed form shuffles once by correlation key — all
linear, none quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import r2, r6
from ..registry import query


@query(
    "sub_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: orders in a window having at least one
    returned lineitem, counted by priority. Declared as LEFT SEMI — the
    decorrelated form: each order emits at most once regardless of how many
    lineitems match, and only (l_orderkey) of the filtered subquery side
    crosses the wire."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "sub_in",
    oracle="""
    SELECT c_mktsegment,
           count(*)                 AS n_customers,
           round(avg(c_acctbal), 6) AS avg_acctbal
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON n_regionkey = r_regionkey
                          WHERE r_name = 'EUROPE')
    GROUP BY c_mktsegment
    """,
)
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery membership against a derived key set (European nations).
    The subquery side is dimension-sized → broadcast LEFT SEMI, so the
    customer table is filtered map-side with zero shuffle before the
    aggregate."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey")
    return (
        c.join(F.broadcast(eur), c.c_nationkey == eur.n_nationkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            r6(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
    )


@query(
    "sub_scalar_global",
    oracle="""
    SELECT o_orderstatus,
           count(*)                    AS n_big_orders,
           round(min(o_totalprice), 2) AS min_big_price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def sub_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above 2× the global mean
    price). The scalar is a one-row aggregate broadcast-cross-joined onto
    the scan — computed exactly once; the outer filter then runs map-side.
    The oracle keeps the unrounded scalar in the predicate on both engines
    (identical double arithmetic), so the comparison is exact."""
    o = t(spark, sf_dir, "orders")
    thresh = o.agg((F.avg("o_totalprice") * 2).alias("thresh"))
    return (
        o.crossJoin(F.broadcast(thresh))
        .filter(F.col("o_totalprice") > F.col("thresh"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_big_orders"),
            r2(F.min("o_totalprice")).alias("min_big_price"),
        )
    )


@query(
    "sub_correlated_agg",
    oracle="""
    SELECT p_brand,
           count(*)                                AS n_small_items,
           round(sum(l_extendedprice) / 7.0, 2)    AS avg_weekly_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem li2
                        WHERE li2.l_partkey = lineitem.l_partkey)
    GROUP BY p_brand
    """,
)
def sub_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated aggregate (lineitems below half their
    part's mean quantity). Declared directly in the decorrelated form
    Catalyst rewrites to: a window average over the correlation key
    (l_partkey) — one shuffle by part, NOT one subquery execution per outer
    row. The part join is broadcast (dimension-sized)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    small = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.5 * F.col("part_avg_qty")
    )
    return (
        small.join(F.broadcast(p), small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_items"),
            r2(F.sum("l_extendedprice") / 7.0).alias("avg_weekly_revenue"),
        )
    )


@query(
    "sub_not_in_nulls",
    oracle="""
    WITH bad AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0),
    bad_null AS (SELECT k FROM bad UNION ALL SELECT CAST(NULL AS BIGINT))
    SELECT
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT k FROM bad)) AS n_not_in,
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT k FROM bad_null)) AS n_not_in_null,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM bad_null b WHERE b.k = o.o_custkey))
        AS n_not_exists_null
    """,
)
def sub_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI three-valued-logic trap, made executable: NOT IN against a
    subquery that contains a NULL returns ZERO rows (x <> NULL is UNKNOWN,
    so the conjunction can never be TRUE), while the NOT EXISTS rewrite of
    the same predicate is unaffected. The one-row report shows all three
    counts side by side — n_not_in (the real exclusion count),
    n_not_in_null (always 0), n_not_exists_null (== n_not_in) — pinning
    that this engine implements the standard's semantics, not the
    intuitive ones. Declared in SQL on both engines so the null-aware
    anti-join planning (Spark's NAAJ) is what executes."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders_v")
    t(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer_v")
    return spark.sql(
        """
        WITH bad AS (SELECT c_custkey AS k FROM sq_customer_v WHERE c_acctbal < 0),
        bad_null AS (SELECT k FROM bad UNION ALL SELECT CAST(NULL AS BIGINT))
        SELECT
          (SELECT count(*) FROM sq_orders_v
           WHERE o_custkey NOT IN (SELECT k FROM bad)) AS n_not_in,
          (SELECT count(*) FROM sq_orders_v
           WHERE o_custkey NOT IN (SELECT k FROM bad_null)) AS n_not_in_null,
          (SELECT count(*) FROM sq_orders_v o
           WHERE NOT EXISTS (SELECT 1 FROM bad_null b WHERE b.k = o.o_custkey))
            AS n_not_exists_null
        """
    )
