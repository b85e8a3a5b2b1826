"""Batch EJ pins — native session_window boundary semantics and
interval-union containment correctness."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface30 as s30
from sap_cta_data_pipeline_spark.operators.surface30 import (
    events_interval_union_sessions,
    win_session_window_native,
)

_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=sec), u, "view", 1.0, "{}")
            for i, (u, sec) in enumerate(rows)
        ],
        _SCHEMA,
    )


def test_native_session_exact_gap_merges(spark):
    # user 1: diffs 1800s (exact gap -> MERGES), then 1801s (breaks)
    df = _events(spark, [(1, 0), (1, 1800), (1, 1800 + 1801)])
    orig = s30.t
    try:
        s30.t = lambda spark_, sf_, name: df  # noqa: ARG005
        rows = sorted(
            win_session_window_native.__wrapped__(spark, "x").collect(),
            key=lambda r: r.session_start,
        )
    finally:
        s30.t = orig
    assert [r.n_events for r in rows] == [2, 1], (
        "exactly-gap pause merges; gap+1s breaks"
    )


def test_native_session_matches_manual_islands(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t

    native = win_session_window_native.__wrapped__(spark, sf_dir)
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    from sap_cta_data_pipeline_spark.functions.parity import um

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = um("ts") - um(F.lag("ts").over(w))
    manual = (
        e.withColumn(
            "ns", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
        )
        .withColumn(
            "sid",
            F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    a = sorted((r.user_id, r.n_events) for r in native.collect())
    b = sorted((r.user_id, r.n_events) for r in manual.collect())
    assert a == b


def test_interval_union_containment(spark):
    # user 1, device split by event_id parity:
    #   device 0 (even ids): one long session 0..7200s
    #   device 1 (odd ids): a CONTAINED session 600..1200s and a
    #   disjoint one at 20000..20600s
    rows = [
        (1, 0),       # id 0  dev0
        (1, 600),     # id 1  dev1
        (1, 1500),    # id 2  dev0
        (1, 1200),    # id 3  dev1
        (1, 3000),    # id 4  dev0
        (1, 20000),   # id 5  dev1
        (1, 4500),    # id 6  dev0
        (1, 20600),   # id 7  dev1
        (1, 6000),    # id 8  dev0
    ]
    df = _events(spark, rows)
    orig = s30.t
    try:
        s30.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = events_interval_union_sessions.__wrapped__(spark, "x").collect()
    finally:
        s30.t = orig
    (r,) = got
    # dev0 session [0, 6000]; dev1 sessions [600, 1200] (contained) and
    # [20000, 20600] (disjoint) -> 2 journeys from 3 intervals. The
    # contained interval is the case lag(end) gets wrong and the
    # running-max-of-ends gets right.
    assert r.n_intervals == 3
    assert r.n_journeys == 2
    assert r.raw_span_us == (6000 + 600 + 600) * 1_000_000
