"""Range-partitioned global ordering primitives.

An unpartitioned ``Window.orderBy`` funnels every row through ONE
partition — fine at fixture scale, a scale-killer at 10⁸+ rows. The
helpers here compute the identical global quantities with the classic
two-phase layout (the same shape ``text_wordcount`` pioneered in round
2, factored out in round 3 so every dimension-grain global window can
drop the single-partition sort):

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range, ranked locally at full parallelism;
2. a per-partition summary (row count / value sum) — at most
   ``n_parts`` rows — cumulated on the driver-sized summary table and
   broadcast back, turning local row_numbers / running sums into the
   exact global ones.

The ``.cache()`` on the range-partitioned frame is load-bearing:
RangePartitioner SAMPLES boundaries per materialization, and the
summary branch and the rank branch must observe the SAME partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rp_pid"


def _ranged(df: DataFrame, order_cols: list[Column], n_parts: int) -> DataFrame:
    return (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .cache()
    )


def with_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "_rn",
    total_col: str | None = None,
    n_parts: int = 32,
) -> DataFrame:
    """All input columns + ``rn_col`` = global row_number under
    ``order_cols`` (caller supplies a total order — include a unique
    tiebreaker), without any single-partition exchange on the data path.
    If ``total_col`` is given, the global row count rides along as a
    column (broadcast-joined, never a driver collect)."""
    part = _ranged(df, order_cols, n_parts)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    sizes = part.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n"))
    offs = sizes.select(
        _PID,
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        *( [F.sum("_n").over(Window.partitionBy()).alias(total_col)] if total_col else [] ),
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    out = part.join(F.broadcast(offs), _PID).withColumn(
        rn_col, F.row_number().over(w_local) + F.col("_off")
    )
    return out.drop(_PID, "_off")


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cum_col: str = "_cum",
    total_col: str | None = None,
    n_parts: int = 32,
) -> DataFrame:
    """All input columns + ``cum_col`` = inclusive global running sum of
    ``value_col`` under ``order_cols`` (and optionally the grand total),
    via local running sums + broadcast per-partition sum offsets."""
    part = _ranged(df, order_cols, n_parts)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    sums = part.groupBy(_PID).agg(F.sum(value_col).alias("_s"))
    offs = sums.select(
        _PID,
        F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_soff"),
        *( [F.sum("_s").over(Window.partitionBy()).alias(total_col)] if total_col else [] ),
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part.join(F.broadcast(offs), _PID).withColumn(
        cum_col, F.sum(value_col).over(w_local) + F.col("_soff")
    )
    return out.drop(_PID, "_soff")


def with_global_running_max(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    max_col: str = "_runmax",
    n_parts: int = 32,
) -> DataFrame:
    """All input columns + ``max_col`` = EXCLUSIVE global running max of
    ``value_col`` under ``order_cols`` (max over strictly preceding rows;
    NULL for the global first row) — the skyline/frontier primitive —
    via local exclusive running maxes + broadcast prior-partition max
    offsets; no single-partition exchange on the data path."""
    part = _ranged(df, order_cols, n_parts)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    maxes = part.groupBy(_PID).agg(F.max(value_col).alias("_m"))
    offs = maxes.select(_PID, F.max("_m").over(w_off).alias("_moff"))
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = part.join(F.broadcast(offs), _PID).withColumn(
        max_col, F.greatest(F.max(value_col).over(w_local), F.col("_moff"))
    )
    return out.drop(_PID, "_moff")


def ntile_expr(rn: Column, total: Column, k: int) -> Column:
    """SQL-standard ``ntile(k)`` from a global row_number and total row
    count: the first ``total mod k`` tiles get ``ceil(total/k)`` rows,
    the rest ``floor(total/k)`` — bit-identical to the window function,
    computable without one."""
    q = F.floor(total / k)
    r = total % k
    big = q + 1
    cut = r * big
    return F.when(rn <= cut, F.floor((rn - 1) / big) + 1).otherwise(
        r + F.floor((rn - 1 - cut) / F.greatest(q, F.lit(1))) + 1
    )
