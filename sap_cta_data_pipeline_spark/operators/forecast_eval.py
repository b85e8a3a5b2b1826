"""§2 round-9 batch FB — forecast backtesting by horizon and the
two-proportion z-test.

- ``ts_forecast_backtest_naive_horizon``: rolling-origin evaluation of
  the NAIVE (last-value) forecaster at horizons h = 1..7 over the last
  28 days — the error-vs-lead-time profile that answers "how far ahead
  can this series be trusted", which the fixed-lag snaive lane
  (events_forecast_snaive) cannot show (its prediction is the same for
  every h ≤ 7). Calendar joins, so date gaps yield excluded NULLs,
  never a silently shifted series.
- ``stats_proportion_ztest``: the conversion-rate A/B test: pooled
  two-proportion z = (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁)) from integer
  (converters, users) per arm — the categorical companion to
  events_ab_ttest (means) and stats_cohens_d (magnitude).

Parity: both lanes assemble from integer counts; divisions and the
single sqrt run on bit-identical operands in both engines.

Scale notes (SCALE.md batch FB): the backtest is one day rollup (the
corpus shuffle) + 7 calendar self-joins at day grain; the z-test is one
user-grain aggregation + a 2-row arm fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "ts_forecast_backtest_naive_horizon",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1
    ),
    horizon AS (SELECT max(day) AS last_day FROM daily),
    hs AS (SELECT h FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(h)),
    test AS (
      SELECT hs.h, d.day, d.c, p.c AS pred
      FROM hs
      JOIN daily d ON true
      JOIN horizon hz ON d.day > hz.last_day - 28
      LEFT JOIN daily p ON p.day = d.day - hs.h
    )
    SELECT CAST(h AS BIGINT) AS horizon,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(c - pred)), 6) AS mae,
           round(avg(abs(c - pred) / c), 6) AS mape
    FROM test WHERE pred IS NOT NULL
    GROUP BY h
    """,
)
def ts_forecast_backtest_naive_horizon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling-origin backtest of the last-value forecaster by horizon:
    for every target day in the last 28 and every h = 1..7, predict with
    the value h days earlier and report per-horizon MAE/MAPE — the
    error-growth curve that sets how far ahead downstream consumers
    (staffing, capacity) may read the forecast, and the baseline curve
    any model's must sit under. Per-horizon, not fixed-lag: that is the
    lead-time dimension the snaive lane deliberately fixes at 7.

    Scale: day rollup once, then 7 broadcast-sized calendar self-joins
    at day grain — §R class-3 calendar work after one corpus shuffle."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    horizon = daily.agg(F.max("day").alias("last_day"))
    hs = spark.range(1, 8).select(F.col("id").cast("int").alias("h"))
    pred = daily.select(F.col("day").alias("day_p"), F.col("c").alias("pred"))
    test = (
        hs.crossJoin(daily)
        .crossJoin(F.broadcast(horizon))
        .where(F.col("day") > F.date_sub("last_day", 28))
        .join(
            pred,
            F.col("day_p") == F.expr("date_sub(day, h)"),
            "left",
        )
        .where(F.col("pred").isNotNull())
    )
    return test.groupBy(F.col("h").cast("long").alias("horizon")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r6(F.avg(F.abs(F.col("c") - F.col("pred")))).alias("mae"),
        r6(F.avg(F.abs(F.col("c") - F.col("pred")) / F.col("c"))).alias("mape"),
    )


@query(
    "stats_proportion_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), a AS (
      SELECT arm, count(*) AS n, sum(conv) AS x FROM u GROUP BY arm
    ), w AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 0 THEN x END) AS x0,
             max(CASE WHEN arm = 1 THEN x END) AS x1
      FROM a
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(CAST(x0 AS DOUBLE) / n0, 6) AS p0,
           round(CAST(x1 AS DOUBLE) / n1, 6) AS p1,
           round((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                 / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z_score
    FROM w
    """,
)
def stats_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test on per-user conversion (any
    'purchase' event) between the experiment arms — THE categorical A/B
    readout: z = (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁)) with p̂ the pooled rate.
    Assembled from four integers (per-arm users and converters), so both
    engines' doubles are bit-identical; planted closed-form pin in
    tests.

    Scale: one user-grain aggregation (the corpus shuffle), a 2-row arm
    aggregate, a 1-row fold — the sufficient-statistic shape."""
    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).cast("int").alias("arm"), "conv")
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (F.col("n0") + F.col("n1"))
    return w.select(
        bi(F.col("n0")).alias("n0"),
        bi(F.col("n1")).alias("n1"),
        r6(p0).alias("p0"),
        r6(p1).alias("p1"),
        r6(
            (p1 - p0)
            / F.sqrt(
                pp
                * (1 - pp)
                * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
            )
        ).alias("z_score"),
    )
