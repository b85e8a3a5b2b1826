"""§2-E Window functions.

Every window here partitions by a real key (customer / user / brand /
segment), so the shuffle distributes and no partition outgrows an executor
at scale. Every ORDER BY carries a unique tiebreak column — ROWS frames
over nondeterministically-ordered ties are the classic silent-wrong-answer
bug under parallelism. Frames are always spelled out (the SQL default frame
RANGE UNBOUNDED PRECEDING..CURRENT ROW is a cross-engine trap for
first/last_value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t, register_views
from ..functions.parity import bi, r2, r6, um
from ..registry import query


@query(
    "win_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        ) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number + filter is the distributed
    top-n-per-group idiom: one shuffle by the partition key, per-partition
    sort, early filter."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", bi(F.row_number().over(w)).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT
      p_brand, p_partkey, p_size,
      CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS rnk,
      CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS drnk
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank — ties by size share a rank on both engines, so
    no tiebreak needed (and adding one would change the semantics)."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        bi(F.rank().over(w)).alias("rnk"),
        bi(F.dense_rank().over(w)).alias("drnk"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 2) AS running_spent
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer. The o_orderkey tiebreak makes the
    ROWS frame deterministic when a customer has two orders the same day."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate", r2(F.sum("o_totalprice").over(w)).alias("running_spent")
    )


@query(
    "win_moving_avg_range",
    oracle="""
    SELECT
      event_id, user_id, ts,
      round(avg(value) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
      ), 6) AS mavg_1h
    FROM events
    """,
)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 1-hour RANGE moving average. Spark range frames
    are numeric-only, so the frame key is integer epoch microseconds on
    both engines — also exact, unlike second-truncated epochs. RANGE frames
    treat equal keys as peers, so no tiebreak is needed (or wanted)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(um("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select("event_id", "user_id", "ts", r6(F.avg("value").over(w)).alias("mavg_1h"))


@query(
    "win_lag_lead",
    oracle="""
    SELECT
      event_id, user_id, event_type,
      epoch_us(ts) - epoch_us(lag(ts) OVER w)  AS gap_us,
      lead(event_type) OVER w                  AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap (lag) and next event type (lead) per user; NULL at
    partition edges."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        (um("ts") - um(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_ntile_pct",
    oracle="""
    SELECT
      c_custkey, c_acctbal,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      round(percent_rank() OVER w, 6) AS pct_rank,
      round(cume_dist() OVER w, 6)    AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over account balance. The custkey
    tiebreak makes ntile deterministic AND gives percent_rank/cume_dist
    identical peer groups on both engines. Single unpartitioned window is
    intentional for a global quartile; at 100 TB use approx quantiles."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        bi(F.ntile(4).over(w)).alias("quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "win_first_last_frame",
    oracle="""
    SELECT
      c_custkey, c_mktsegment, c_acctbal,
      first_value(c_name) OVER (
        PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS poorest_name,
      last_value(c_name) OVER (
        PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS richest_name
    FROM customer
    """,
)
def win_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with the full-partition frame spelled out —
    under the default frame, last_value degenerates to the current row (the
    classic trap; SURVEY.md §2-E)."""
    c = t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_name").over(w).alias("poorest_name"),
        F.last("c_name").over(w).alias("richest_name"),
    )


@query(
    "win_share_of_total",
    oracle="""
    WITH s AS (
      SELECT s_nationkey,
             s_suppkey,
             CAST(sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_c
      FROM supplier GROUP BY 1, 2
    )
    SELECT s_nationkey, s_suppkey,
           CAST(bal_c AS DOUBLE) / 100 AS acctbal,
           round(CAST(bal_c AS DOUBLE)
                 / CAST(sum(bal_c) OVER (PARTITION BY s_nationkey) AS DOUBLE),
                 6) AS share_of_nation
    FROM s
    WHERE bal_c > 0
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-group reporting: each supplier's share of its nation's
    positive account-balance pool — the ratio-to-report window every BI
    layer ships. Balances are quantized to integer cents before the
    partition sum (float-summation-proof denominator, same discipline as
    the ABC/RFM money paths); one keyed window, no global state."""
    s = t(spark, sf_dir, "supplier")
    bal_c = F.round(F.col("s_acctbal") * 100, 0).cast("long")
    g = (
        s.groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(bal_c).alias("bal_c"))
        .where(F.col("bal_c") > 0)
    )
    w = Window.partitionBy("s_nationkey")
    return g.select(
        "s_nationkey",
        "s_suppkey",
        (F.col("bal_c").cast("double") / 100).alias("acctbal"),
        r6(
            F.col("bal_c").cast("double") / F.sum("bal_c").over(w).cast("double")
        ).alias("share_of_nation"),
    )


@query(
    "win_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, revenue,
           round(median(revenue) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM daily
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily revenue — the robust
    (outlier-immune) twin of win_moving_avg_range, and a window Spark has
    no native aggregate for: the frame's values are collected per row
    (collect_list over ROWS BETWEEN 6 PRECEDING AND CURRENT ROW — frame
    size is a CONSTANT 7, so per-row state is bounded by the frame, not
    the series) and the exact interpolating median computed in-row from
    the sorted frame. Runs at DAY grain — post-aggregation,
    calendar-bounded rows (SCALE.md §R class 3); the fact-grain work is
    the keyed daily agg. Window input is pre-rounded r2 so the median's
    operands are engine-identical; even-frame interpolation (a+b)/2 then
    matches bit-for-bit."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    frame = F.array_sort(F.collect_list("revenue").over(w))
    n = F.size(frame)
    med = F.when(
        n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(frame, (n / 2).cast("int"))
            + F.element_at(frame, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "revenue",
        F.round(med, 4).alias("med7"),
    )


@query(
    "win_time_range_frame",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, revenue,
           round(sum(revenue) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 2)
             AS rev_7d,
           CAST(count(*) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_days_present
    FROM daily
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval RANGE frame: trailing 7 CALENDAR days of revenue
    per day — the frame that stays correct when days are MISSING from the
    series, which a ROWS BETWEEN 6 PRECEDING frame silently is not
    (it would reach back across gaps; win_moving_avg_range is the
    value-range sibling, this is the time-range one). n_days_present
    exposes exactly where the two frames would diverge. Runs through
    spark.sql because interval range frames are a SQL-syntax surface;
    day grain, calendar-bounded (§R class 3)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH daily AS (
          SELECT to_date(o_orderdate) AS day,
                 round(sum(o_totalprice), 2) AS revenue
          FROM orders GROUP BY 1
        )
        SELECT CAST(day AS STRING) AS day, revenue,
               round(sum(revenue) OVER (ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 2)
                 AS rev_7d,
               CAST(count(*) OVER (ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_days_present
        FROM daily
        """
    )
