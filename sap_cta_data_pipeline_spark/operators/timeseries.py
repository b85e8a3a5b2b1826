"""§2 round-2 addendum — time-series operators over the event stream.

The hypertable-style workloads a telemetry/observability user runs daily:

- ts_rollup_hierarchy — minute → hour → day rollup chain where every level
  is re-aggregated FROM THE PREVIOUS LEVEL, not from raw events. This is
  the continuous-aggregate / hypertable-rollup pattern: at 100 TB the raw
  table is scanned once (minute rollup), and each coarser level reads the
  (orders-of-magnitude smaller) persisted finer level. sum/count/min/max
  are algebraic, so the chain is lossless; the oracle aggregates raw →
  day directly and must agree.
- ts_ohlc_bars — open/high/low/close bars per (series, hour) via
  ``min_by``/``max_by`` over a (ts, event_id) tiebreak struct: a single
  partial+final aggregation, no window shuffle, deterministic under ties.
- ts_gapfill_locf — dense-grid gap filling with last-observation-carried-
  forward: per-series hour grid from ``sequence()``, left join observed
  hours, ``last(ignorenulls)`` running window. Grid size = series × hours
  (dim-bounded), never event-cardinality.
- events_max_concurrent — sweep-line max concurrency: each event spans
  [ts, ts+floor(value) seconds); +1/−1 deltas are pre-summed per distinct
  timestamp (deterministic under ties, shrinks the window input), then one
  keyed running sum. All arithmetic in epoch microseconds (BIGINT) so both
  engines compare integers, never intervals.
- events_zscore_outliers — per-series z-score anomaly flags: one tiny
  stats aggregate broadcast back onto the stream; |z| > 2.5. The join-back
  is O(|series|) rows broadcast, the stream is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6, um
from ..registry import query


@query(
    "ts_rollup_hierarchy",
    oracle="""
    SELECT event_type,
           CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS day,
           round(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS DOUBLE)
                 / 1000000.0, 4) AS total_value,
           count(*)             AS n_events,
           min(value)           AS min_value,
           max(value)           AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup minute→hour→day where each level merges the
    previous level's partial aggregates (sum-of-sums, sum-of-counts,
    min-of-mins, max-of-maxes). The raw table is touched exactly once; the
    hour and day levels aggregate dim-bounded rollup rows — the persisted
    continuous-aggregate pattern a 100 TB telemetry store relies on. The
    oracle aggregates raw→day directly, proving the chain lossless.
    Values quantize once to integer micro-units (BIGINT) so the sums are
    EXACT at every level — the rollup is then bit-identical to the direct
    aggregate regardless of merge order, which floats cannot promise."""
    e = t(spark, sf_dir, "events")
    v_micro = F.round(F.col("value") * 1000000, 0).cast("long")
    minute = (
        e.groupBy("event_type", F.date_trunc("minute", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(v_micro).alias("total_micro"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    def roll(df: DataFrame, unit: str) -> DataFrame:
        return (
            df.groupBy("event_type", F.date_trunc(unit, F.col("bucket")).alias("bucket"))
            .agg(
                F.sum("total_micro").alias("total_micro"),
                F.sum("n_events").alias("n_events"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
    day = roll(roll(minute, "hour"), "day")
    return day.select(
        "event_type",
        F.col("bucket").cast("string").alias("day"),
        F.round(F.col("total_micro").cast("double") / 1000000.0, 4).alias("total_value"),
        "n_events",
        "min_value",
        "max_value",
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value, ts, event_id
      FROM events
    ), o AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts, event_id) AS rn_open,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM b
    )
    SELECT event_type, bucket,
           max(CASE WHEN rn_open = 1 THEN value END)  AS open,
           max(value)                                 AS high,
           min(value)                                 AS low,
           max(CASE WHEN rn_close = 1 THEN value END) AS close,
           count(*)                                   AS n_ticks
    FROM o
    GROUP BY event_type, bucket
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (series, hour). open/close use ``min_by``/``max_by``
    keyed on a (ts, event_id) struct — deterministic under equal
    timestamps, and a plain algebraic aggregate (map-side partials, one
    shuffle) instead of the two window passes the oracle spells out. The
    values are untouched parquet doubles, so no rounding is needed for
    cross-engine parity."""
    e = t(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.min_by("value", ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ord_key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             round(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS DOUBLE)
                   / (count(*) * 1000000.0), 6) AS v
      FROM events GROUP BY 1, 2
    ), rng AS (
      SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ), grid AS (
      SELECT event_type,
             unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM rng
    )
    SELECT g.event_type,
           CAST(g.h AS VARCHAR) AS hour,
           last_value(hy.v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           CAST(hy.v IS NULL AS BIGINT) AS filled_from_prior
    FROM grid g LEFT JOIN hourly hy ON g.event_type = hy.event_type AND g.h = hy.h
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward. The
    dense grid is generated per series with ``sequence(min_h, max_h, 1h)``
    — grid cardinality is series × hours, independent of event volume — and
    the fill is one keyed ``last(ignorenulls)`` running window. The first
    grid hour per series is observed by construction (it IS min(h)), so
    v_filled is never null. The hourly mean sums integer micro-units
    (exact BIGINT) instead of float avg(): an avg sat on a 6th-decimal
    round boundary once in 3600 cells at sf0.1 and flipped engines."""
    e = t(spark, sf_dir, "events")
    v_micro = F.round(F.col("value") * 1000000, 0).cast("long")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.round(
                F.sum(v_micro).cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("v")
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    filled = grid.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        F.col("h").cast("string").alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        bi(F.col("v").isNull().cast("int")).alias("filled_from_prior"),
    )


@query(
    "events_max_concurrent",
    oracle="""
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type,
             epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS t,
             -1 AS d
      FROM events
    ), net AS (
      SELECT event_type, t, CAST(sum(d) AS BIGINT) AS net FROM pts GROUP BY 1, 2
    ), run AS (
      SELECT event_type,
             CAST(sum(net) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cur
      FROM net
    )
    SELECT event_type, max(cur) AS max_concurrent FROM run GROUP BY event_type
    """,
)
def events_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max concurrency per series, treating each event as the
    interval [ts, ts + floor(value) seconds). The +1/−1 deltas are summed
    per DISTINCT timestamp first — that makes the running sum deterministic
    under ties AND shrinks the window input to distinct-boundary
    cardinality — then one keyed running sum and a max. All time math is
    epoch-microsecond BIGINT (``floor`` before the cast: Spark truncates
    double→long, DuckDB rounds, so the floor pins both)."""
    e = t(spark, sf_dir, "events")
    dur_us = F.floor(F.col("value")).cast("long") * F.lit(1000000).cast("long")
    starts = e.select("event_type", um("ts").alias("t"), F.lit(1).alias("d"))
    ends = e.select("event_type", (um("ts") + dur_us).alias("t"), F.lit(-1).alias("d"))
    net = starts.unionAll(ends).groupBy("event_type", "t").agg(F.sum("d").alias("net"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.select("event_type", F.sum("net").over(w).alias("cur"))
    return run.groupBy("event_type").agg(F.max("cur").alias("max_concurrent"))


@query(
    "events_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.m) / s.sd, 6) AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) > 2.5
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score outliers (|z| > 2.5). The per-series mean/stddev
    aggregate is O(|series|) rows and is broadcast back onto the stream —
    one full scan, one tiny broadcast, no event-cardinality shuffle. The
    2.5σ threshold sits far from any rounding boundary on this corpus."""
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 2.5)
        .select("event_id", "event_type", r6(z).alias("z"))
    )


@query(
    "orders_growth_mom_yoy",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ), g AS (
      SELECT month, rev_c, n_orders,
             lag(rev_c, 1)  OVER (ORDER BY month) AS prev_m,
             lag(rev_c, 12) OVER (ORDER BY month) AS prev_y
      FROM m
    )
    SELECT month,
           round(CAST(rev_c AS DOUBLE) / 100, 2) AS revenue,
           CAST(n_orders AS BIGINT) AS n_orders,
           round((CAST(rev_c AS DOUBLE) - prev_m) / prev_m * 100, 6) AS mom_pct,
           round((CAST(rev_c AS DOUBLE) - prev_y) / prev_y * 100, 6) AS yoy_pct
    FROM g
    """,
)
def orders_growth_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: monthly revenue
    in exact integer cents (summation-order-proof, the
    ts_rollup_hierarchy trick), then lag(1) and lag(12) growth
    percentages. The lag window is unpartitioned BUT post-aggregation:
    its input is one row per month (80 here, ~1200 for a century of
    data), driver-sized forever — this is the acceptable class of global
    window (SCALE.md global-window inventory), unlike a global window
    over raw rows. One shuffle for the month agg, one trivial sort for
    the lag."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    g = m.select(
        "month",
        "rev_c",
        "n_orders",
        F.lag("rev_c", 1).over(w).alias("prev_m"),
        F.lag("rev_c", 12).over(w).alias("prev_y"),
    )
    rev_d = F.col("rev_c").cast("double")
    return g.select(
        "month",
        F.round(rev_d / 100, 2).alias("revenue"),
        bi(F.col("n_orders")).alias("n_orders"),
        r6((rev_d - F.col("prev_m")) / F.col("prev_m") * 100).alias("mom_pct"),
        r6((rev_d - F.col("prev_y")) / F.col("prev_y") * 100).alias("yoy_pct"),
    )


@query(
    "orders_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ), moy AS (
      SELECT CAST(EXTRACT(MONTH FROM month) AS BIGINT) AS month_of_year,
             count(*) AS n_months,
             CAST(sum(rev_c) AS DOUBLE) / count(*) / 100 AS avg_rev
      FROM m GROUP BY 1
    ), tot AS (
      SELECT avg(avg_rev) AS grand FROM moy
    )
    SELECT month_of_year, CAST(n_months AS BIGINT) AS n_months,
           avg_rev,
           round(avg_rev / tot.grand, 6) AS seasonality_idx
    FROM moy CROSS JOIN tot
    """,
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality index: average monthly revenue per
    month-of-year, normalized by the grand mean of those 12 averages
    (index > 1 = seasonally strong month). Monthly sums use exact integer
    cents (summation-order-proof); the month-of-year re-aggregation runs
    over the 80-row monthly table and the normalizing scalar is a
    broadcast crossjoin — post-aggregation everything is driver-sized at
    any corpus scale."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev_c")
    )
    moy = m.groupBy(
        F.month("month").cast("long").alias("month_of_year")
    ).agg(
        F.count(F.lit(1)).alias("n_months"),
        (
            F.sum("rev_c").cast("double") / F.count(F.lit(1)) / 100
        ).alias("avg_rev"),
    )
    tot = moy.agg(F.avg("avg_rev").alias("grand"))
    return moy.crossJoin(F.broadcast(tot)).select(
        "month_of_year",
        bi(F.col("n_months")).alias("n_months"),
        F.col("avg_rev"),
        r6(F.col("avg_rev") / F.col("grand")).alias("seasonality_idx"),
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, year(min(o_orderdate)) AS cohort_year
      FROM orders GROUP BY o_custkey
    ),
    sizes AS (
      SELECT cohort_year, count(*) AS cohort_size FROM first_order GROUP BY 1
    ),
    rev AS (
      SELECT f.cohort_year,
             year(o.o_orderdate) - f.cohort_year AS age_years,
             sum(o.o_totalprice) AS revenue
      FROM orders o JOIN first_order f USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT r.cohort_year, CAST(r.age_years AS BIGINT) AS age_years,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(r.revenue, 2) AS revenue,
           round(sum(r.revenue) OVER (PARTITION BY r.cohort_year
                                      ORDER BY r.age_years), 2) AS cum_revenue,
           ((2 * CAST(round(sum(r.revenue) OVER (PARTITION BY r.cohort_year
                                                 ORDER BY r.age_years) * 100) AS BIGINT)
             + s.cohort_size) // (2 * s.cohort_size)) / 100.0 AS ltv_per_customer
    FROM rev r JOIN sizes s USING (cohort_year)
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    year, revenue accumulated by cohort age, normalized per cohort
    member — the LTV triangle finance teams read off every subscription
    dashboard. Fact-grain work is two customer-keyed aggs (first order,
    then (cohort, age) revenue — the window that computes first-order
    year rides the same user-keyed shuffle pattern as
    events_cohort_retention); the cumulative sum then runs at COHORT
    grain (years × ages ≤ dozens of rows — post-agg, the documented
    acceptable-global-window class in SCALE.md §R)."""
    o = t(spark, sf_dir, "orders")
    w_cust = Window.partitionBy("o_custkey")
    base = o.select(
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").alias("yr"),
        F.year(F.min("o_orderdate").over(w_cust)).alias("cohort_year"),
    )
    sizes = (
        base.select("o_custkey", "cohort_year")
        .distinct()
        .groupBy("cohort_year")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    rev = base.groupBy(
        "cohort_year", (F.col("yr") - F.col("cohort_year")).alias("age_years")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w_cum = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("revenue").over(w_cum)
    # ltv = cum/size rounded to cents goes through EXACT integer-cents
    # math: o_totalprice is an exact multiple of 0.01, so round(cum*100)
    # recovers integer cents losslessly, and half-up division
    # (2x + n) div (2n) is engine-portable — a double quotient would
    # terminate on .xx5 boundaries where engine round()s disagree
    # (SURVEY §5.3 rationals-on-boundaries hazard; win_percent_cume's
    # decimal route solves the same class for k/n rationals)
    cents = F.round(cum * 100).cast("long")
    return rev.join(F.broadcast(sizes), "cohort_year").select(
        "cohort_year",
        bi(F.col("age_years")).alias("age_years"),
        bi(F.col("cohort_size")).alias("cohort_size"),
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.round(cum, 2).alias("cum_revenue"),
        (2 * cents + F.col("cohort_size")).cast("long").alias("_num"),
    ).withColumn(
        "ltv_per_customer",
        F.expr("_num div (2 * cohort_size)") / 100.0,
    ).drop("_num")


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT sum(rev_cents) AS total_cents, count(*) AS n FROM daily
    ),
    c AS (
      SELECT day, rev_cents,
             sum(rev_cents) OVER (ORDER BY day) AS cum_cents,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM daily
    )
    SELECT CAST(day AS VARCHAR) AS day,
           rev_cents / 100.0 AS revenue,
           round((tot.n * c.cum_cents - c.t * tot.total_cents)
                 / (tot.n * 100.0), 2) AS cusum,
           20 * abs(tot.n * c.cum_cents - c.t * tot.total_cents)
             > tot.n * tot.n * (tot.total_cents // 100) AS regime_shift
    FROM c CROSS JOIN tot
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily revenue series: the
    cumulative sum of deviations from the global mean drifts near zero
    under a stable regime and runs away after a level shift (the classic
    Page-test shape, online-able with one float of state —
    stream_stateful_running is the streaming twin). Flagged when |CUSUM|
    exceeds 5% of total revenue.

    Arithmetic is EXACT-INTEGER end to end (SURVEY §5.3
    rationals-on-boundaries hazard, caught by the sf0.001 sweep): daily
    revenue becomes integer cents, and CUSUM_t = cum_t − t·mean is
    computed as the integer n·cum_cents − t·total_cents — identical
    BIGINTs on both engines — so the final double division and the
    threshold comparison see bit-identical operands (a float mean would
    differ at the last ulp by summation order and amplify through the
    running sum; one boundary cell DID flip). Fact-grain work is the
    keyed daily agg; the running sum is day-grain (§R class 3)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_cents")
    )
    tot = daily.agg(
        F.sum("rev_cents").alias("total_cents"), F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_cents"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    num = F.col("n") * F.col("cum_cents") - F.col("t") * F.col("total_cents")
    return c.crossJoin(F.broadcast(tot)).select(
        F.col("day").cast("string").alias("day"),
        (F.col("rev_cents") / 100.0).alias("revenue"),
        F.round(num / (F.col("n") * 100.0), 2).alias("cusum"),
        (
            20 * F.abs(num)
            > F.col("n") * F.col("n") * F.expr("total_cents div 100")
        ).alias("regime_shift"),
    )


@query(
    "orders_open_backlog_daily",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS opened,
             CAST(max(l.l_shipdate) AS DATE) AS closed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT opened AS day, 1 AS d FROM spans
      UNION ALL
      SELECT closed, -1 FROM spans
    ),
    daily AS (
      SELECT day, sum(d) AS net FROM deltas GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(net AS BIGINT) AS net_change,
           CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog — the operations burn-down: an order is
    open from its order date until its last line ships; the count of
    concurrently open orders per day comes from the sweep-line identity
    (+1 on open, −1 on close, running sum) exactly as
    events_max_concurrent — but here the intervals themselves are
    DERIVED by a fact-fact join (order → last shipment), so the op
    composes the §C join shape with the sweep. Delta stream is 2 rows
    per order; the cumsum runs at day grain (§R class 3). A backlog
    that trends up is the report; everything else is drill-down."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    spans = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.to_date("o_orderdate").alias("opened"),
            F.to_date("last_ship").alias("closed"),
        )
    )
    deltas = spans.select(F.col("opened").alias("day"), F.lit(1).alias("d")).unionAll(
        spans.select(F.col("closed").alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("net")).alias("net_change"),
        bi(F.sum("net").over(w)).alias("open_orders"),
    )


#: Holt's linear-trend smoothing constants (level α, trend β) — part of
#: the operator contract; both engines fold with these literals.
_HOLT_A = 0.3
_HOLT_B = 0.1


@query(
    "ts_holt_linear",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id HAVING count(*) >= 2
    ),
    folded AS (
      SELECT user_id, len(vals) AS n_events,
             list_reduce(
               list_transform(vals, x -> [CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)]),
               (acc, x) -> [
                 {_HOLT_A}e0 * x[1] + (1 - {_HOLT_A}e0) * (acc[1] + acc[2]),
                 {_HOLT_B}e0 * (({_HOLT_A}e0 * x[1] + (1 - {_HOLT_A}e0) * (acc[1] + acc[2])) - acc[1])
                      + (1 - {_HOLT_B}e0) * acc[2]
               ]) AS st
      FROM per_user
    )
    SELECT user_id,
           CAST(n_events AS BIGINT)       AS n_events,
           round(st[1], 6)                AS level,
           round(st[2], 6)                AS trend,
           round(st[1] + 3 * st[2], 6)    AS forecast_3
    FROM folded
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per user series —
    EWMA's two-state sibling: level l_t = αy_t + (1−α)(l_{{t−1}}+b_{{t−1}}),
    trend b_t = β(l_t − l_{{t−1}}) + (1−β)b_{{t−1}}, plus the h-step
    forecast l+h·b that is the whole point of keeping a trend state
    (capacity planning, volume projection). Like ts_ewma_fold the
    recurrence has no windowed-SQL form; it folds sequentially over the
    time-ordered list IN-ROW with a struct accumulator. The l_t
    expression is deliberately DUPLICATED inside the trend update on
    both engines (struct fields cannot reference siblings mid-
    construction), so the two engines execute literally the same IEEE
    operation sequence — the §5.3 discipline that makes a 2-state float
    fold hashable. Oracle hazard found while building this: DuckDB's
    list_reduce mutates a STRUCT accumulator's fields IN PLACE
    sequentially (field 2's expression sees field 1's NEW value), so the
    oracle carries the state as a 2-element LIST, whose constructor
    evaluates all elements against the pre-step accumulator — verified
    element-exact against a reference fold. Init = first-element (l=y₀, b=0), users with < 2
    events excluded (no trend estimable). One groupBy shuffle, fold is
    in-row, state is 2 doubles regardless of series length."""
    e = t(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    per_user = (
        e.groupBy("user_id")
        .agg(F.transform(arr, lambda s: s["value"]).alias("vals"))
        .filter(F.size("vals") >= 2)
    )
    a, b = F.lit(_HOLT_A), F.lit(_HOLT_B)

    def _step(acc, x):
        new_l = a * x["l"] + (F.lit(1) - a) * (acc["l"] + acc["b"])
        new_l_dup = a * x["l"] + (F.lit(1) - a) * (acc["l"] + acc["b"])
        new_b = b * (new_l_dup - acc["l"]) + (F.lit(1) - b) * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    states = F.transform(
        "vals", lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b"))
    )
    folded = F.aggregate(
        F.slice(states, 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(states, 1),
        _step,
    )
    return per_user.select(
        "user_id",
        bi(F.size("vals")).alias("n_events"),
        r6(folded["l"]).alias("level"),
        r6(folded["b"]).alias("trend"),
        r6(folded["l"] + F.lit(3) * folded["b"]).alias("forecast_3"),
    )
