"""Structured Streaming twins (SURVEY.md §2-K).

Each function takes a *streaming* DataFrame with the `events` schema
(`readStream` from parquet/file source) and returns a streaming DataFrame
whose complete/append output equals the §2-K batch declaration — asserted
in tests/test_streaming.py by feeding the sf0.001 events through a file
source with availableNow and comparing frames.

At scale these run with event-time watermarks so state stores stay
bounded: windows/session state is dropped once the watermark passes, and
`applyInPandasWithState` carries explicit per-key timeouts.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from ..functions.parity import um
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP; catalog timestamps are TIMESTAMP_NTZ.
    The cast is value-preserving under the UTC session; outputs are cast
    back to NTZ so twins frame-match their batch declarations."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def _ntz(name: str):
    return F.col(name).cast("timestamp_ntz").alias(name)


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Twin of stream_tumbling: 1h tumbling count+sum per type with a
    10-minute watermark."""
    return (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Twin of stream_sliding: 1h windows sliding 15 minutes."""
    return (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "sum_value")
    )


def session_aggregates(events: DataFrame) -> DataFrame:
    """Twin of stream_session via the native session_window operator
    (30-minute inactivity gap). Emits per-session bounds and aggregates;
    session_window's end is last_event + gap, so span is derived from
    min/max event times, mirroring the batch gaps-and-islands output."""
    return (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (um(F.max("ts")) - um(F.min("ts"))).alias("span_us"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id", _ntz("session_start"), _ntz("session_end"),
            "n_events", "span_us", "session_value"
        )
    )


def session_dynamic_gap(events: DataFrame) -> DataFrame:
    """Twin of stream_session_dynamic_gap: native ``session_window`` with
    a PER-EVENT gap expression (purchase holds the session open 45 min,
    click/view 15, else 30) under a 10-minute watermark, APPEND mode —
    the incremental-state exercise of the dynamic-gap contract
    (tests/test_streaming_multibatch.py feeds time-ordered chunks so
    sessions finalize as the watermark passes their end). The gap must
    be CalendarIntervalType (make_interval), not a numeric column.
    Output grain matches the batch lane minus its ordinal session_id
    (an implementation detail the native operator has no analogue for):
    (user_id, session_start, n_events, window_span_us) where
    span = window end − start = max(ts+gap) − min(ts)."""
    gap = F.expr(
        "CASE event_type WHEN 'purchase' THEN make_interval(0,0,0,0,0,45,0) "
        "WHEN 'click' THEN make_interval(0,0,0,0,0,15,0) "
        "WHEN 'view' THEN make_interval(0,0,0,0,0,15,0) "
        "ELSE make_interval(0,0,0,0,0,30,0) END"
    )
    return (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            (um(F.col("w.end")) - um(F.col("w.start"))).alias("window_span_us"),
        )
    )


def dedup_keyed(events: DataFrame) -> DataFrame:
    """Twin of stream_dedup_keyed: streaming dropDuplicates on
    (user_id, minute) within the watermark. Which duplicate survives is
    arrival-order-dependent — with a single ordered source it is the first
    arrival, matching the batch row_number()=1 definition."""
    with_min = _with_event_time(events).withColumn(
        "minute_start", F.date_trunc("minute", F.col("ts"))
    )
    return (
        with_min.withWatermark("minute_start", "10 minutes")
        .dropDuplicates(["user_id", "minute_start"])
        .select("event_id", "user_id", _ntz("minute_start"), "event_type")
    )


_RUNNING_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("running_n", LongType()),
        StructField("running_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Keyed state: {n, total} per user, updated in (ts, event_id) order.
    Rows within a micro-batch are sorted before folding so the emitted
    running values match the batch event-time ordering."""
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out_n, out_v = [], []
        for v in pdf["value"]:
            n += 1
            total += float(v)
            out_n.append(n)
            out_v.append(round(total, 6))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "running_n": out_n,
                "running_value": out_v,
            }
        )
    state.update((n, total))


def stateful_running(events: DataFrame) -> DataFrame:
    """Twin of stream_stateful_running via applyInPandasWithState: custom
    keyed state (count + sum per user) across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_counts_for_topk(events: DataFrame) -> DataFrame:
    """Stage 1 of the two-stage streaming top-k (twin of
    stream_topk_windowed): the watermarked tumbling count/sum per
    (window, type) — incrementally expressible, bounded state. Rank over
    updating counts is NOT incrementally expressible, so stage 2
    (`topk_rank`) runs inside the foreachBatch sink on each micro-batch's
    complete output — the standard streaming top-k split."""
    return (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def topk_rank(counted: DataFrame, k: int = 3) -> DataFrame:
    """Stage 2: per-window rank with the pinned tie-break (count desc,
    type asc) — applied batch-side to each foreachBatch frame."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def click_purchase_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Twin of stream_join_interval: watermarked stream-stream inner join —
    each purchase pairs with same-user clicks from the preceding 30
    minutes. Both sides carry a 10-minute watermark and the join condition
    bounds click event time relative to purchase event time, which is what
    lets Spark expire buffered click state (unbounded stream-stream joins
    never free state)."""
    c = (
        _with_event_time(clicks)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    p = (
        _with_event_time(purchases)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts "
            "AND c_ts > p_ts - INTERVAL 30 MINUTES"
        ),
    ).select("purchase_id", "click_id")


def click_purchase_pairs_outer(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Twin of stream_join_left_outer: the same watermarked interval join
    run leftOuter. The event-time bound lets Spark expire click state;
    the watermark additionally tells it when a buffered purchase can be
    declared UNMATCHED and emitted with nulls — outer results are only
    final once the watermark passes the purchase's join window, so rows
    near the end of a bounded run stay withheld (the twin test compares
    on the watermark-finalized prefix)."""
    c = (
        _with_event_time(clicks)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    p = (
        _with_event_time(purchases)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts "
            "AND c_ts > p_ts - INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "p_ts")


def chained_window_agg(events: DataFrame) -> DataFrame:
    """Twin of stream_chained_window_agg: TWO stateful windowed
    aggregations chained in ONE streaming query (Spark's
    multiple-stateful-operators support) — 15-min counts re-windowed to
    1-hour (max, avg) via window(window_col, '1 hour') under a single
    10-minute watermark, append mode. Windows still open at the final
    watermark stay in state (the append-mode boundary); the equality
    test compares the finalized prefix."""
    sub = (
        _with_event_time(events)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        sub.groupBy(F.window(F.col("w"), "1 hour").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_subwindows"),
            F.max("n").alias("max_15m"),
            F.sum("n").alias("sn"),
        )
        .select(
            F.col("h.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            F.col("n_subwindows").cast("bigint").alias("n_subwindows"),
            F.col("max_15m").cast("bigint").alias("max_15m"),
            F.round(
                F.col("sn").cast("double") / F.col("n_subwindows"), 6
            ).alias("avg_15m"),
        )
    )
