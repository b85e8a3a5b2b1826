"""§2 round-7 batch CJ — time-series decomposition & trading-style bands.

Completes the forecasting/monitoring surface (rounds 2-6: rollups, OHLC,
LOCF gapfill, CUSUM changepoints, Holt, Croston, seasonal-naive, MAD and
seasonal anomalies) with the three shapes users reach for next:

- classical additive DECOMPOSITION (trend = centered moving average,
  seasonal = day-of-week means of the detrended series normalized to sum
  zero, residual = remainder) plus the seasonal-strength statistic,
- Bollinger bands (rolling mean ± 2σ) with breach flags — the ops
  monitoring staple,
- running-peak drawdown (max peak-to-trough decline of cumulative
  revenue) — the canonical "how bad did it get" statistic.

Scale notes: everything is one day-grain aggregation (rows → days, the
only corpus-sized shuffle) followed by day-grain windows — a year is
365 rows per series key, so the window stages are metadata-sized. The
daily series is gap-FILLED from a generated calendar first (a missing
day is a zero-revenue day, not a skipped lag), the same discipline as
ts_gapfill_locf / orders_open_backlog_daily. Centered-MA edges emit NULL
trend (no partial windows — partial means would bias the seasonal fit);
the seasonal fit simply skips NULL-trend days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: shared day-grain revenue series: calendar-gap-filled daily order totals
_DAILY_SQL = """
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    cal AS (
      SELECT unnest(generate_series((SELECT min(day) FROM d),
                                    (SELECT max(day) FROM d),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    s AS (
      SELECT cal.day, coalesce(d.revenue, 0.0) AS revenue
      FROM cal LEFT JOIN d ON cal.day = d.day
    )
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, revenue) gap-filled daily revenue — the shared series under
    every batch-CJ lane. One corpus-sized aggregation; the calendar join
    is day-grain (sequence on a 1-row min/max frame)."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return cal.join(d, "day", "left").select(
        "day", F.coalesce("revenue", F.lit(0.0)).alias("revenue")
    )


@query(
    "ts_stl_decompose_daily",
    oracle=_DAILY_SQL
    + """,
    q AS (
      SELECT day, CAST(round(revenue, 0) AS BIGINT) AS v FROM s
    ),
    tr AS (
      SELECT day, v,
             CASE WHEN count(*) OVER w = 7
                  THEN CAST(sum(v) OVER w AS BIGINT) END AS sv
      FROM q
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    se AS (
      -- detrended in EXACT integers: 7*v - sv = 7*(v - trend)
      SELECT dayofweek(day) AS dow,
             CAST(sum(7 * v - sv) AS BIGINT) AS d7, count(*) AS n
      FROM tr WHERE sv IS NOT NULL GROUP BY 1
    ),
    sn AS (
      SELECT dow, d7 / (7.0 * n) AS raw_seasonal,
             d7 / (7.0 * n) - avg(d7 / (7.0 * n)) OVER () AS seasonal
      FROM se
    )
    SELECT CAST(tr.day AS VARCHAR) AS day,
           CAST(tr.v AS BIGINT) AS revenue,
           round(tr.sv / 7.0, 6) AS trend,
           round(sn.seasonal, 6) AS seasonal,
           round(tr.v - tr.sv / 7.0 - sn.seasonal, 6) AS residual
    FROM tr JOIN sn ON dayofweek(tr.day) = sn.dow
    """,
)
def ts_stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue: trend = 7-day
    CENTERED moving average (full windows only — edge days emit NULL
    trend rather than a biased partial mean), seasonal = day-of-week
    means of (revenue − trend) normalized to sum zero over the week,
    residual = the remainder. This is the decomposition under every
    'is this dip seasonal or real' question; the windowed form is what
    STL's loess smoother degrades to with a fixed period and no
    robustness iterations — and unlike STL it is expressible as three
    hash aggs + day-grain windows, so the 100 TB plan is one corpus
    shuffle. Seasonal normalization uses a 7-row window (metadata)."""
    # integer sufficient statistics throughout (the ts_bollinger_breach
    # lesson, applied BEFORE it flakes here): v = whole-unit revenue,
    # trend = sv/7 (a k/7 fraction — never at a rounding half-point),
    # detrended sums as EXACT 7v − sv integers so the seasonal means are
    # single divisions of identical integers on both engines.
    s = _daily_series(spark, sf_dir)
    q = s.select("day", F.round("revenue", 0).cast("long").alias("v"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = q.select(
        "day",
        "v",
        F.when(F.count(F.lit(1)).over(w) == 7, F.sum("v").over(w)).alias("sv"),
    )
    se = (
        tr.filter(F.col("sv").isNotNull())
        .groupBy((F.dayofweek("day") - 1).alias("dow"))
        .agg(
            F.sum(7 * F.col("v") - F.col("sv")).alias("d7"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    raw = F.col("d7") / (7.0 * F.col("n"))
    sn = se.select(
        "dow",
        (raw - F.avg(raw).over(Window.partitionBy())).alias("seasonal"),
    )
    trend = F.col("sv") / 7.0
    return (
        tr.join(F.broadcast(sn), (F.dayofweek(tr.day) - 1) == sn.dow)
        .select(
            F.col("day").cast("string").alias("day"),
            bi(F.col("v")).alias("revenue"),
            r6(trend).alias("trend"),
            r6(F.col("seasonal")).alias("seasonal"),
            r6(F.col("v") - trend - F.col("seasonal")).alias("residual"),
        )
    )


@query(
    "ts_bollinger_breach",
    oracle=_DAILY_SQL
    + """,
    q AS (
      SELECT day, CAST(round(revenue, 0) AS BIGINT) AS v FROM s
    ),
    b AS (
      SELECT day, v,
             CAST(sum(v) OVER w AS BIGINT) AS sv,
             CAST(sum(v * v) OVER w AS BIGINT) AS sv2,
             count(*) OVER w AS n
      FROM q
      WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    m AS (
      SELECT day, v, sv / 20.0 AS ma,
             sqrt(greatest((sv2 - sv / 20.0 * sv) / 19.0, 0.0)) AS sd
      FROM b WHERE n = 20
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(v AS BIGINT) AS revenue,
           CAST(round(ma, 0) AS BIGINT) AS ma20,
           CAST(round(ma + 2 * sd, 0) AS BIGINT) AS upper_band,
           CAST(round(ma - 2 * sd, 0) AS BIGINT) AS lower_band,
           CASE WHEN v > ma + 2 * sd THEN 1
                WHEN v < ma - 2 * sd THEN -1 ELSE 0 END AS breach
    FROM m
    """,
)
def ts_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue: trailing 20-day mean ± 2 sample
    std deviations, with a breach flag (+1 above, −1 below). Emitted
    only for FULL 20-day windows — a partial-window σ is an
    underestimate that fires false breaches in the first weeks, the
    classic monitoring bug.

    Numerics: the day series quantizes to WHOLE currency units (BIGINT)
    before the windows, and mean/σ come from exact integer Σv and Σv²
    via the sufficient-statistics identity — float frame aggregates over
    the raw doubles put every 20th-cell mean on a rounding boundary
    (both engines' sliding-window sums add in different orders; 10/2386
    cells flipped at r2, 1/2386 at r6 — measured), while single
    divisions/sqrts of identical integers are bit-identical everywhere.
    Σv² stays within BIGINT at whole-unit scale (v ≤ ~1e8 → 20·v² ≤
    2e17); the sub-unit truncation is irrelevant to a band monitor. At
    100 TB the series is still O(days) per key, so the window stage
    never sees corpus-sized data."""
    s = _daily_series(spark, sf_dir)
    q = s.select(
        "day", F.round("revenue", 0).cast("long").alias("v")
    )
    w = Window.orderBy("day").rowsBetween(-19, 0)
    b = q.select(
        "day",
        "v",
        F.sum("v").over(w).alias("sv"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("sv2"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") == 20)
    ma = F.col("sv") / 20.0
    sd = F.sqrt(
        F.greatest(
            (F.col("sv2") - F.col("sv") / 20.0 * F.col("sv")) / 19.0,
            F.lit(0.0),
        )
    )
    # bands emit as WHOLE-UNIT BIGINTs: round(x, k>0) at 1e7 magnitudes
    # is ill-conditioned cross-engine (the scaled multiply loses the very
    # digits being rounded — r6 flipped 1/2386 cells, measured twice);
    # round-to-integer's boundary is 0.5 against ~4e-9 ulp — stable.
    return b.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("v")).alias("revenue"),
        bi(F.round(ma, 0)).alias("ma20"),
        bi(F.round(ma + 2 * sd, 0)).alias("upper_band"),
        bi(F.round(ma - 2 * sd, 0)).alias("lower_band"),
        F.when(F.col("v") > ma + 2 * sd, 1)
        .when(F.col("v") < ma - 2 * sd, -1)
        .otherwise(0)
        .alias("breach"),
    )


@query(
    "ts_drawdown_max",
    oracle=_DAILY_SQL
    + """,
    c AS (
      SELECT day, sum(CAST(round(revenue * 100, 0) AS BIGINT)) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM s
    ),
    dd AS (
      SELECT day, cum,
             max(cum) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM c
    )
    SELECT round(max(peak - cum) / 100.0, 2) AS max_drawdown,
           round(max(CASE WHEN peak > 0
                          THEN (peak - cum) / (peak * 1.0) END), 6)
             AS max_drawdown_pct,
           CAST(max(CASE WHEN peak - cum =
                 (SELECT max(peak - cum) FROM dd) THEN day END) AS VARCHAR)
             AS trough_day
    FROM dd
    """,
)
def ts_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue: running peak minus
    current cumulative, maximized — with the trough day (latest, if
    tied) and the peak-relative percentage. Two running windows over the
    day-grain series then a 1-row final; the finance-style statistic
    every 'how bad was the worst stretch' dashboard needs. Revenue is
    quantized to integer CENTS before the running sums: float windowed
    sums accumulate in engine-specific order, and a 6e-8 peak−cum
    residue is enough to flip the tie-broken trough day cross-engine
    (measured) — exact integers make the drawdown and its argmax
    deterministic. On REAL signed series (refunds, PnL) the same plan
    applies unchanged; tests pin a signed synthetic case."""
    s = _daily_series(spark, sf_dir)
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cents = F.round(F.col("revenue") * 100, 0).cast("long")
    c = s.select("day", F.sum(cents).over(wrun).alias("cum"))
    dd = c.select(
        "day", "cum", F.max("cum").over(wrun).alias("peak")
    ).select(
        "day", "cum", "peak", (F.col("peak") - F.col("cum")).alias("dd")
    )
    mx = dd.agg(F.max("dd").alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.round(F.max("dd") / 100.0, 2).alias("max_drawdown"),
            r6(
                F.max(
                    F.when(
                        F.col("peak") > 0,
                        F.col("dd") / F.col("peak").cast("double"),
                    )
                )
            ).alias("max_drawdown_pct"),
            F.max(
                F.when(F.col("dd") == F.col("mdd"), F.col("day"))
            )
            .cast("string")
            .alias("trough_day"),
        )
    )
