"""§2 round-7 batch CV — window frame EXCLUDE clause equivalences.

The ANSI window EXCLUDE clause (EXCLUDE CURRENT ROW / EXCLUDE GROUP /
EXCLUDE TIES) is the standard way to ask "the frame, without me/my
peers" — leave-one-out baselines, peer comparisons. Spark has no
EXCLUDE; both forms reduce to frame arithmetic that Catalyst executes
as ordinary windows (DuckDB's NATIVE EXCLUDE is the oracle on both):

- EXCLUDE CURRENT ROW ≡ frame aggregate − current row's value,
- EXCLUDE GROUP ≡ frame aggregate − the ORDER-BY peer group's
  aggregate (a second window keyed by (partition, order value) — same
  exchange, no extra shuffle).

Both identities hold for any invertible aggregate (sum/count/avg via
sum&count); min/max do NOT invert — for those the rewrite is a
two-sided frame split, documented here and deliberately out of scope.

Scale: two windows over one partition key = one exchange; nothing
changes shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "win_frame_exclude_current",
    oracle="""
    SELECT o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(coalesce(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
             EXCLUDE CURRENT ROW), 0), 2) AS peer_sum,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
             EXCLUDE CURRENT ROW) AS BIGINT) AS peer_n
    FROM orders WHERE o_custkey < 50
    """,
)
def win_frame_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXCLUDE CURRENT ROW`` — the leave-one-out window (how does this
    order compare to the 6 around it, NOT counting itself): frame sum −
    own value, frame count − 1. The oracle runs DuckDB's native EXCLUDE
    against the arithmetic identity; rows are fully tie-broken
    ((o_orderdate, o_orderkey)) so the ±3-row frame is deterministic.
    One window spec, two aggregates, one exchange."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 3)
    )
    return o.select(
        "o_custkey",
        bi(F.col("o_orderkey")).alias("o_orderkey"),
        F.round(
            F.sum("o_totalprice").over(w) - F.col("o_totalprice"), 2
        ).alias("peer_sum"),
        bi(F.count(F.lit(1)).over(w) - 1).alias("peer_n"),
    )


@query(
    "win_frame_exclude_group",
    oracle="""
    SELECT o_custkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS order_us,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(coalesce(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP), 0), 2) AS other_days_sum
    FROM orders WHERE o_custkey < 50
    """,
)
def win_frame_exclude_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXCLUDE GROUP`` — the frame without my ORDER-BY peer group
    (all MY order-date's rows removed): customer total − same-day
    subtotal, i.e. 'what did this customer spend on OTHER days'. The
    peer-group subtotal is a second window keyed by (custkey, orderdate)
    — Catalyst places both windows on the one custkey exchange. Oracle
    is DuckDB's native EXCLUDE GROUP over the unbounded frame."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    wall = Window.partitionBy("o_custkey")
    wgrp = Window.partitionBy("o_custkey", "o_orderdate")
    return o.select(
        "o_custkey",
        bi(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "order_us"
        ),
        bi(F.col("o_orderkey")).alias("o_orderkey"),
        F.round(
            F.sum("o_totalprice").over(wall)
            - F.sum("o_totalprice").over(wgrp),
            2,
        ).alias("other_days_sum"),
    )
