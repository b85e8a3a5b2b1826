"""§2 round-8 batch EJ — native session_window in batch + interval
union (cross-device session stitching).

- ``win_session_window_native``: Spark's NATIVE ``session_window``
  operator running in a BATCH aggregation — the declarative twin of
  stream_session's gaps-and-islands compilation, now value-oracled as
  its own key. Semantics pinned at the boundary: a diff of EXACTLY the
  gap still MERGES (the native window is closed at prev_ts + gap —
  probed empirically, planted exact-gap pin); only diff > gap breaks.
- ``events_interval_union_sessions``: merge overlapping intervals —
  the cross-device session-stitching verb (and the calendar-union verb
  behind SLA/maintenance-window math): per-device sessions (device =
  event_id parity, the deterministic stand-in) become user-level
  journeys by unioning overlapping [start, end] intervals,
  the islands pattern lifted from rows to INTERVALS (new island when
  start > running max of previous ends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6, um
from ..registry import query

_GAP_US = 1_800_000_000  # 30 minutes


@query(
    "win_session_window_native",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS session_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def win_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window(ts, '30 minutes')`` in a batch
    groupBy — no lag, no island numbering, the engine merges the
    windows itself. The oracle compiles the SAME semantics to
    gaps-and-islands with the NATIVE boundary rule: sessions break only
    at diff STRICTLY greater than the gap (an exactly-30-minute pause
    still merges — the native window closes at prev_ts + gap inclusive,
    probed and pinned on planted timestamps). Emitting
    session_start (= min ts = the native window's start) keys the
    comparison without exposing engine-specific window structs.

    Scale: one shuffle on user_id, then Spark's sort-based session
    merge within partitions — the same cost envelope as the manual
    islands form, with the plan intent declared to the optimizer."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            bi(F.count(F.lit(1))).alias("n_events"),
            r6(F.sum("value")).alias("session_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


@query(
    "events_interval_union_sessions",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id % 2 AS device, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_GAP_US}
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_id % 2 ORDER BY ts, event_id)
    ), dev_sessions AS (
      SELECT user_id,
             min(ts) AS s, max(ts) AS e
      FROM (
        SELECT user_id, device, ts,
               sum(new_session) OVER (
                 PARTITION BY user_id, device ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
      ) GROUP BY user_id, device, sid
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN epoch_us(s) > max(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_block
      FROM dev_sessions
    ), blocks AS (
      SELECT user_id, s, e,
             sum(new_block) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid
      FROM marked
    )
    SELECT user_id,
           CAST(count(DISTINCT bid) AS BIGINT) AS n_journeys,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(epoch_us(e) - epoch_us(s)) AS BIGINT) AS raw_span_us
    FROM blocks GROUP BY user_id
    """,
)
def events_interval_union_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union — merge overlapping [start, end] intervals per
    user: device-grain sessions (gap ≥ 30 min breaks, same rule as the
    native lane) become user journeys by starting a NEW block whenever
    an interval's start exceeds the running max of all previous ends
    (ORDER BY start; the running max — not lag(end) — is what makes
    nested/contained intervals correct, pinned on a planted containment
    case). Reports journeys vs raw intervals per user — the dedup
    factor cross-device stitching buys.

    Scale: two user-keyed window stages over sessions (already
    session-grain, tiny vs events); the same single-shuffle envelope as
    sessionization itself."""
    e = t(spark, sf_dir, "events").withColumn(
        "device", F.col("event_id") % 2
    )
    w = Window.partitionBy("user_id", "device").orderBy("ts", "event_id")
    gap = um("ts") - um(F.lag("ts").over(w))
    sids = e.select(
        "user_id",
        "device",
        "ts",
        F.when(gap.isNull() | (gap >= _GAP_US), 1).otherwise(0).alias("ns"),
    ).select(
        "user_id",
        "device",
        "ts",
        F.sum("ns")
        .over(
            Window.partitionBy("user_id", "device")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("sid"),
    )
    dev = sids.groupBy("user_id", "device", "sid").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max(um("e")).over(wprev)
    marked = dev.select(
        "user_id",
        "s",
        "e",
        F.when(
            prev_max_e.isNull() | (um("s") > prev_max_e), 1
        )
        .otherwise(0)
        .alias("new_block"),
    )
    blocks = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("new_block")
        .over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("bid"),
    )
    return blocks.groupBy("user_id").agg(
        bi(F.countDistinct("bid")).alias("n_journeys"),
        bi(F.count(F.lit(1))).alias("n_intervals"),
        bi(F.sum(um("e") - um("s"))).alias("raw_span_us"),
    )
