"""§2 round-9 batch FR — exact distinct via mergeable bitmaps + the
deterministic mode.

``agg_bitmap_distinct``: Spark's bitmap aggregate family
(bitmap_bit_position / bitmap_construct_agg / bitmap_count) as the
EXACT mergeable distinct-count — the middle point between
count_distinct (exact, but a full shuffle of raw values) and HLL
(mergeable, approximate): values fold into fixed 4 KB bucket bitmaps
map-side, buckets merge associatively, and the count is exact. The
house roaring codecs (Delta/Iceberg DVs) are the storage-side cousins
of the same idea; this key pins the ENGINE's built-in surface.

``agg_mode_exact``: the mode done deterministically — most frequent
quantity per return flag with an explicit (count DESC, value ASC)
tie-break, because both engines' native mode() picks ties arbitrarily
(Spark F.mode documents nondeterminism on ties) — counts + rank is the
portable exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_custkeys,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customers per priority via TWO-LEVEL bitmap
    aggregation: level 1 folds custkeys into per-(priority, bucket)
    bitmaps (bitmap_bucket_number / bitmap_bit_position partition the
    key space into 32768-bit buckets; construct_agg is a map-side
    combinable byte-OR), level 2 sums bitmap_count per priority —
    exact, mergeable, and shuffling only bucket bitmaps instead of raw
    keys. Oracle: plain COUNT(DISTINCT). Planted pin: duplicates
    collapse (n keys with multiplicity m count once).

    Scale: the shuffle carries |priorities|·⌈keyspace/32768⌉ bitmaps
    (KBs) instead of one row per distinct value — the reason engines
    ship bitmap aggs next to HLL when exactness is required."""
    o = t(spark, sf_dir, "orders")
    b = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return b.groupBy("o_orderpriority").agg(
        bi(F.expr("sum(bitmap_count(bm))")).alias("nd_custkeys"),
        bi(F.sum("n")).alias("n_orders"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(round(l_quantity, 0) AS BIGINT) AS q,
             count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_returnflag, q, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, q) AS rk
      FROM c
    )
    SELECT l_returnflag,
           CAST(q AS BIGINT) AS mode_quantity,
           CAST(cnt AS BIGINT) AS mode_count
    FROM ranked WHERE rk = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode of quantity per return flag: value-grain
    counts, then ONE rank per group with the explicit
    (count DESC, value ASC) tie-break — the portable form of mode(),
    which both engines otherwise resolve ties on arbitrarily. Planted
    tie pin: two equally-frequent values return the smaller.

    Scale: a hash agg to the (flag, value) grain plus a rank over the
    value grain PER GROUP (partitioned window — parallel across
    flags); never a row-level sort of the fact table."""
    li = t(spark, sf_dir, "lineitem")
    c = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_quantity"), 0).cast("long").alias("q"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wrk = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("q")
    )
    return (
        c.select("*", F.row_number().over(wrk).alias("rk"))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            bi(F.col("q")).alias("mode_quantity"),
            bi(F.col("cnt")).alias("mode_count"),
        )
    )
