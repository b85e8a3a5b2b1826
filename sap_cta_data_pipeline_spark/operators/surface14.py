"""§2 round-7 batch CN — SQL-surface equivalences, fourth installment.

Four surfaces a SQL user coming from a single-node engine expects, each
expressed Spark-first and certified against the OTHER engine's native
form — the point is cross-dialect equivalence, not syntax emulation:

- GROUPS window frames (Spark has ROWS/RANGE only): a frame of N
  preceding peer GROUPS is exactly a RANGE frame over dense_rank —
  the oracle runs DuckDB's NATIVE ``GROUPS BETWEEN`` against the
  rewrite,
- ``DISTINCT ON`` (one row per key by an ORDER BY): row_number window +
  filter — the oracle runs DuckDB's native ``DISTINCT ON``,
- ``QUALIFY`` (filter on a window result without a subquery): Spark
  expresses it as window column + filter; DuckDB's native QUALIFY is
  the oracle,
- bitwise aggregates (bit_and/bit_or/bit_xor): native in BOTH engines
  since Spark 3.x / DuckDB 0.x — the parity pin is the overflow-free
  BIGINT semantics on grouped data.

Scale notes: all four are one keyed window or one hash aggregation —
nothing here changes shape at 100 TB; the GROUPS rewrite adds a second
window over the SAME partition key (no extra shuffle — both windows
share the exchange, visible in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "win_groups_frame_equiv",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_totalprice,
             dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
               AS grp
      FROM orders WHERE o_custkey < 50
    )
    SELECT o_custkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS order_us,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW
           ), 2) AS grp_sum
    FROM r
    """,
)
def win_groups_frame_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS window frames without GROUPS support: a frame of
    ``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`` is exactly a RANGE
    frame over the peer group's ``dense_rank`` — peers (rows tied on the
    ORDER BY key) share a dense_rank, so rank-RANGE arithmetic counts
    GROUPS, which row-ROWS frames cannot (they split peer groups at the
    frame edge — the bug this rewrite exists to avoid). Neither engine
    here implements GROUPS natively (Spark by design, DuckDB 1.0.0
    raises 'not implemented yet' — verified), so BOTH sides run the
    dense_rank-RANGE identity and the hash certifies it cross-engine;
    tests additionally pin the frame semantics on a hand-computed tied
    series. Two windows, one partition key, ONE exchange (they share
    the hash partitioning)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    wrank = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ranked = o.select(
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.dense_rank().over(wrank).alias("grp"),
    )
    wgrp = (
        Window.partitionBy("o_custkey").orderBy("grp").rangeBetween(-1, 0)
    )
    return ranked.select(
        "o_custkey",
        bi(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "order_us"
        ),
        F.round(F.sum("o_totalprice").over(wgrp), 2).alias("grp_sum"),
    )


@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_nationkey)
           c_nationkey, c_custkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DISTINCT ON (key) ... ORDER BY key, tiebreak`` — the Postgres/
    DuckDB idiom for 'one row per key, picked by an order'. Spark's
    equivalent is the top-1 window: row_number over (key, ORDER BY
    tiebreak) filtered to 1 — identical semantics INCLUDING the
    deterministic tiebreak (c_custkey ascending breaks acctbal ties;
    DISTINCT ON without a full tiebreak is nondeterministic in both
    engines, the trap this key documents). One keyed window, no global
    sort."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "sql_qualify_equiv",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM part
    QUALIFY rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC,
                         p_partkey) <= 3
    """,
)
def sql_qualify_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``QUALIFY`` — filtering on a window function without a derived
    table (Snowflake/DuckDB/BigQuery surface). Spark's equivalent is the
    window column + filter + drop; Catalyst collapses it to the same
    plan a native QUALIFY produces (window, then filter above it — the
    filter cannot push through the window, in either engine). Top-3
    parts per brand by price with a deterministic tiebreak."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT l_linestatus,
           CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over grouped BIGINTs — native in
    both engines (Spark bit_and/bit_or/bit_xor). XOR-aggregation is the
    practical one: it is its own inverse, so a mergeable XOR of row
    checksums detects set differences between replicas in O(1) state —
    the same trick dq_order_balance_check uses row-wise. Plain one-
    shuffle hash aggregation with map-side partials."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        bi(F.bit_and("l_orderkey")).alias("key_and"),
        bi(F.bit_or("l_orderkey")).alias("key_or"),
        bi(F.bit_xor("l_orderkey")).alias("key_xor"),
        bi(F.count(F.lit(1))).alias("n"),
    )
