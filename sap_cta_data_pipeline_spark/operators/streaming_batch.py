"""§2-K Streaming semantics, batch-declared.

The driver oracle is batch-only, so each op here is the BATCH definition
of a streaming computation over `events`; the Structured Streaming twins
(readStream + watermarks + session_window + applyInPandasWithState) live
in `sap_cta_data_pipeline_spark.streaming.twins` and are asserted equal to
these results in tests/test_streaming.py (SURVEY.md §2-K).

Arrival order for watermark/dedup simulations is `event_id` order
(FIXTURES.md: event_id ascends roughly with ts — genuinely late rows
exist, which is the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r2, r6, um
from ..registry import QUERIES, query

_10_MIN_US = 600 * 1_000_000
_30_MIN_US = 1_800 * 1_000_000


@query(
    "stream_tumbling",
    oracle="""
    SELECT
      date_trunc('hour', ts)  AS window_start,
      event_type,
      count(*)                AS n,
      round(sum(value), 2)    AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts + sums per event type. Streaming twin
    adds withWatermark('ts', '10 minutes') — identical logic otherwise."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT
      time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
      count(*)             AS n,
      round(sum(value), 2) AS sum_value
    FROM events, range(0, 4) t(k)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes — each event lands in 4
    windows (the oracle materializes exactly those four starts per event)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "stream_session",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM gaps
    )
    SELECT
      user_id,
      CAST(session_id AS BIGINT)            AS session_id,
      min(ts)                               AS session_start,
      max(ts)                               AS session_end,
      count(*)                              AS n_events,
      epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
      round(sum(value), 6)                  AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap via
    gaps-and-islands (lag → new-session flag → running sum = session id).
    Semantically identical to session_window(ts, '30 minutes') — the
    streaming twin uses exactly that, and tests assert equality."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = um("ts") - um(F.lag("ts").over(w))
    with_flag = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > _30_MIN_US), 1).otherwise(0)
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_id = with_flag.withColumn("session_id", bi(F.sum("new_session").over(wrun)))
    return with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (um(F.max("ts")) - um(F.min("ts"))).alias("span_us"),
        r6(F.sum("value")).alias("session_value"),
    )


@query(
    "stream_late_drop",
    oracle="""
    WITH arr AS (
      SELECT event_id, event_type, ts,
             max(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS high_watermark_us
      FROM events
    )
    SELECT event_id, event_type, ts
    FROM arr
    WHERE epoch_us(ts) >= high_watermark_us - 600000000
    """,
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch-simulated: processing in arrival order
    (event_id), an event is dropped when its event time lags the
    per-type high watermark (running max event time) by > 10 minutes —
    exactly what withWatermark('ts','10 minutes') drops in the twin."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hwm = F.max(um("ts")).over(w)
    return (
        e.withColumn("hwm_us", hwm)
        .filter(um("ts") >= F.col("hwm_us") - _10_MIN_US)
        .select("event_id", "event_type", "ts")
    )


@query(
    "stream_dedup_keyed",
    oracle="""
    SELECT event_id, user_id, minute_start, event_type FROM (
      SELECT event_id, user_id, event_type,
             date_trunc('minute', ts) AS minute_start,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('minute', ts) ORDER BY event_id
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, minute) in arrival order — the batch
    definition of streaming dropDuplicates within a watermark."""
    e = t(spark, sf_dir, "events").withColumn("minute_start", F.date_trunc("minute", F.col("ts")))
    w = Window.partitionBy("user_id", "minute_start").orderBy("event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "minute_start", "event_type")
    )


@query(
    "stream_stateful_running",
    oracle="""
    SELECT
      event_id, user_id,
      CAST(count(*) OVER w AS BIGINT) AS running_n,
      round(sum(value) OVER w, 6)     AS running_value
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event count + running value sum in event-time
    order — the batch shadow of a keyed stateful operator
    (applyInPandasWithState twin keeps {n, sum} per user as state)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        bi(F.count(F.lit(1)).over(w)).alias("running_n"),
        r6(F.sum("value").over(w)).alias("running_value"),
    )


@query(
    "stream_topk_windowed",
    oracle="""
    WITH counted AS (
      SELECT date_trunc('hour', ts) AS window_start,
             event_type,
             count(*)               AS n,
             round(sum(value), 2)   AS sum_value
      FROM events
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, event_type ASC) AS rk
      FROM counted
    )
    SELECT window_start, event_type, n, sum_value, rk
    FROM ranked WHERE rk <= 3
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour (trending-items shape), with a
    pinned tie-break (count desc, type asc). Windowed agg then a
    per-window rank — the window key partitions the rank, so no global
    sort. Streaming deployment: the windowed count is an incremental
    watermarked agg; the per-window top-k runs in the foreachBatch sink
    (or a downstream batch view) since rank-over-updates is not
    incrementally expressible — the standard two-stage streaming top-k."""
    e = t(spark, sf_dir, "events")
    counted = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counted.withColumn("rk", bi(F.row_number().over(w)))
        .filter(F.col("rk") <= 3)
    )


@query(
    "stream_join_interval",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >  p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch declaration of a stream-stream interval join: every
    (purchase, click) pair for the same user with the click in the 30
    minutes up to the purchase. Bucketed into 30-minute epochs with a
    2-bucket explode on the purchase side (every qualifying pair shares
    one of the two buckets), so the self-join is equi-keyed on
    (user, bucket) and never per-user quadratic. The streaming twin
    (streaming/twins.py) runs the same predicate as a watermarked
    stream-stream inner join, where the 30-minute bound is what lets
    Spark expire join state."""
    e = t(spark, sf_dir, "events")
    epoch = (F.unix_timestamp(F.col("ts").cast("timestamp")) / 1800).cast("long")
    p = (
        e.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            epoch.alias("b"),
        )
        .withColumn("bucket", F.explode(F.array(F.col("b") - 1, F.col("b"))))
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        epoch.alias("bucket_c"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("bucket") == F.col("bucket_c"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "click_id")


@query(
    "stream_join_left_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p
    LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >  p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    """,
)
def stream_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch declaration of a stream-stream LEFT OUTER interval join:
    every purchase with its same-user clicks from the preceding 30
    minutes, or a NULL click row if none — the "did this conversion have
    a trigger?" query, where the outer rows are exactly the organic
    purchases. Matched pairs reuse stream_join_interval's bucketed
    equi-join (30-minute epochs, 2-bucket explode — never per-user
    quadratic); outer rows come from ONE anti-join of purchases against
    the matched ids, NOT from outer-joining the exploded frame (which
    would emit one null per bucket). The streaming twin runs the same
    predicate as a watermarked leftOuter stream-stream join, where the
    time bound + watermark are what let Spark both expire click state
    AND know when an unmatched purchase is final."""
    inner = QUERIES["stream_join_interval"](spark, sf_dir)
    e = t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id")
    )
    unmatched = p.join(
        inner.select("purchase_id").distinct(), "purchase_id", "left_anti"
    ).withColumn("click_id", F.lit(None).cast("long"))
    return inner.unionByName(unmatched)


@query(
    "events_lateness_report",
    oracle="""
    WITH arr AS (
      SELECT event_type, ts,
             max(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS frontier
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE ts < frontier) AS BIGINT) AS n_out_of_order,
           CAST(count(*) FILTER (
             WHERE epoch_us(frontier) - epoch_us(ts) > 600000000
           ) AS BIGINT) AS n_late_beyond_wm,
           CAST(max(epoch_us(frontier) - epoch_us(ts)) AS BIGINT) AS max_lateness_us
    FROM arr
    GROUP BY event_type
    """,
)
def events_lateness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing report — the measurement that DECIDES the 10-minute
    delay every streaming op here assumes: replaying the stream in
    arrival order (event_id, FIXTURES.md), track the event-time frontier
    (running max), and per stream count out-of-order events, events later
    than the 10-minute watermark (these are exactly what
    stream_late_drop discards), and the worst observed lateness. One
    global arrival-order window — justified here because ARRIVAL order
    is the thing being audited (it has no partition key by definition);
    at 100 TB this runs per ingest partition/hour and the per-stream
    counters merge (max/sum algebra), never as one global replay."""
    e = t(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    arr = e.select(
        "event_type", "ts", F.max("ts").over(w).alias("frontier")
    )
    late_us = um("frontier") - um("ts")
    return arr.groupBy("event_type").agg(
        bi(F.count(F.lit(1))).alias("n_events"),
        bi(F.sum((F.col("ts") < F.col("frontier")).cast("int"))).alias("n_out_of_order"),
        bi(F.sum((late_us > 600_000_000).cast("int"))).alias("n_late_beyond_wm"),
        bi(F.max(late_us)).alias("max_lateness_us"),
    )


_THROTTLE_US = 10 * 60 * 1_000_000


def _throttle_fold(pdf):
    """Per-(user, type) debounce: keep an event iff > 10 min after the
    last KEPT event — O(1) state (last kept ts), events streamed once."""
    import pandas as pd

    pdf = pdf.sort_values(["t", "event_id"]).reset_index(drop=True)
    kept = []
    last_kept = None
    for t_us, eid in zip(pdf["t"], pdf["event_id"]):
        t_us = int(t_us)
        if last_kept is None or t_us - last_kept > _THROTTLE_US:
            kept.append(eid)
            last_kept = t_us
    out = pdf[pdf["event_id"].isin(kept)][
        ["user_id", "event_type", "event_id", "t"]
    ]
    return out


@query(
    "stream_throttle_keyed",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    per_key AS (
      SELECT user_id, event_type,
             list(t ORDER BY t, event_id) AS ts,
             list(event_id ORDER BY t, event_id) AS ids
      FROM e GROUP BY 1, 2
    ),
    folded AS (
      -- acc = [last_kept_ts, flag_1..flag_k]; keep iff > 10 min after
      -- the last KEPT event (non-associative: depends on every prior
      -- keep decision) — the dropDuplicatesWithinWatermark contract
      SELECT user_id, event_type, ts, ids,
        list_reduce(
          list_transform(ts, x -> [x, CAST(1 AS BIGINT)]),
          (acc, x) -> CASE
            WHEN x[1] - acc[1] > {_THROTTLE_US}
            THEN list_append(
                   list_concat([x[1]], list_slice(acc, 2, len(acc))),
                   CAST(1 AS BIGINT))
            ELSE list_append(
                   list_concat([acc[1]], list_slice(acc, 2, len(acc))),
                   CAST(0 AS BIGINT))
          END) AS st
      FROM per_key
    ),
    flags AS (
      SELECT user_id, event_type,
             unnest(list_zip(ids, ts, list_slice(st, 2, len(st)))) AS z
      FROM folded
    )
    SELECT user_id, event_type,
           CAST(z[1] AS BIGINT) AS event_id,
           CAST(z[2] AS BIGINT) AS kept_at_us
    FROM flags WHERE z[3] = 1
    """,
)
def stream_throttle_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed event THROTTLE (debounce): keep an event iff it arrives
    more than 10 minutes after the last KEPT event of its
    (user, event_type) — the batch contract of Spark 4's
    ``dropDuplicatesWithinWatermark`` (state = last kept timestamp,
    evicted once the watermark passes it). The keep decision depends on
    every PRIOR keep (non-associative — no window rewrite exists), so
    the lane is a per-key applyInPandas fold with O(1) state after one
    keyed shuffle, and the oracle replays the IDENTICAL fold via DuckDB
    list_reduce (the sessionize_capped discipline) — every keep
    decision is hash-certified. tests/test_streaming_multibatch.py pins
    the real streaming operator against this contract:
    first-per-key ⊆ streaming-kept ⊆ throttle-kept."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    out = e.groupBy("user_id", "event_type").applyInPandas(
        _throttle_fold,
        schema="user_id bigint, event_type string, event_id bigint, t bigint",
    )
    return out.select(
        "user_id",
        "event_type",
        bi(F.col("event_id")).alias("event_id"),
        bi(F.col("t")).alias("kept_at_us"),
    )


_SAX_BREAKS = (-0.6745, 0.0, 0.6745)  # N(0,1) quartile breakpoints, |Σ|=4


@query(
    "ts_sax_symbolic",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
      FROM daily GROUP BY 1
    ),
    z AS (
      SELECT d.event_type, d.day,
             round((d.v - s.mu) / nullif(s.sd, 0.0), 6) AS z
      FROM daily d JOIN stats s USING (event_type)
    ),
    sym AS (
      SELECT event_type, day,
             CASE WHEN z < -0.6745 THEN 'a'
                  WHEN z < 0.0     THEN 'b'
                  WHEN z < 0.6745  THEN 'c'
                  ELSE 'd' END AS s
      FROM z
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           string_agg(s, '' ORDER BY day) AS sax
    FROM sym GROUP BY 1
    """,
)
def ts_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation): each type's daily-mean
    series z-normalized and mapped through the N(0,1) quartile
    breakpoints to a 4-letter alphabet — the discretization that turns
    numeric series into STRINGS so similarity/motif search runs on text
    machinery (grams, hashing, suffix structures). Day grain makes every
    window metadata-sized; z-scores are r6-quantized BEFORE the
    breakpoint comparison so a float-dust straddle cannot flip a symbol
    (the ts_drawdown_max lesson). Two bounded aggs + one O(types) join;
    the symbol string assembles in-row from a day-ordered collect."""
    daily = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
        )
        .agg(F.avg("value").alias("v"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    z = daily.join(stats, "event_type").select(
        "event_type",
        "day",
        r6((F.col("v") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))).alias(
            "z"
        ),
    )
    sym = z.select(
        "event_type",
        "day",
        F.when(F.col("z") < _SAX_BREAKS[0], "a")
        .when(F.col("z") < _SAX_BREAKS[1], "b")
        .when(F.col("z") < _SAX_BREAKS[2], "c")
        .otherwise("d")
        .alias("s"),
    )
    return sym.groupBy("event_type").agg(
        bi(F.count(F.lit(1))).alias("n_days"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "s"))),
                lambda x: x["s"],
            ),
        ).alias("sax"),
    )


@query(
    "stream_chained_window_agg",
    oracle="""
    WITH sub AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '1 hour', w15) AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_subwindows,
           CAST(max(n) AS BIGINT) AS max_15m,
           round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_15m
    FROM sub GROUP BY 1, 2
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED windowed aggregation — 15-minute counts per type
    re-aggregated into 1-hour (max, avg) of sub-window activity: the
    burstiness rollup that needs TWO stateful operators in one query.
    Batch-declared here; the Structured Streaming twin runs both levels
    in a single streaming query (Spark's multiple-stateful-operators
    support: window(window_col, '1 hour') re-windowing under one
    watermark, append mode), asserted equal on the finalized prefix in
    tests — the engine surface this key exists to pin. avg is exact
    integer sum / count.

    Scale: two hash aggs, the second over the 15-min grain (96·|types|
    rows/day) — the chained-agg plan is what saves a second full scan
    at 100 TB; without it the rollup re-reads the corpus."""
    e = t(spark, sf_dir, "events")
    sub = e.groupBy(
        F.window("ts", "15 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        sub.groupBy(
            F.window(F.col("w"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_subwindows"),
            F.max("n").alias("max_15m"),
            F.sum("n").alias("sn"),
        )
        .select(
            F.col("h.start").alias("hour_start"),
            "event_type",
            bi(F.col("n_subwindows")).alias("n_subwindows"),
            bi(F.col("max_15m")).alias("max_15m"),
            r6(
                F.col("sn").cast("double") / F.col("n_subwindows")
            ).alias("avg_15m"),
        )
    )
