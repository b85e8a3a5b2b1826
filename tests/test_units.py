"""Unit tests on tiny hand-built inputs (SURVEY.md §5.2.3): pin the exact
edge-case semantics of the custom operators — threshold boundaries, tie
rules, watermark boundaries — independent of the synthetic corpus."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.engine import Engine
from sap_cta_data_pipeline_spark.functions.parity import um
from sap_cta_data_pipeline_spark.operators.pipeline import _tailcut_keep


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    from sap_cta_data_pipeline_spark.registry import QUERIES

    assert len(eng.keys()) == len(QUERIES) >= 159
    assert eng.run("agg_pricing_summary").count() == 6
    assert eng.sql("SELECT count(*) AS n FROM region").collect()[0].n == 5
    assert eng.oracle("agg_pricing_summary") and eng.oracle("sim_ann_lsh") is None


def test_tailcut_keep_semantics(spark):
    """Boundary cell below T_pic survives ONLY next to a picture cell;
    thresholds are inclusive."""
    rows = [
        # (x, left, right, expected_keep) with T_pic=0.2, T_bnd=0.1
        (0.2, 0.0, 0.0, True),   # at picture threshold (inclusive)
        (0.19, 0.25, 0.0, True), # boundary next to picture neighbor
        (0.19, 0.0, 0.0, False), # boundary but isolated
        (0.1, 0.2, 0.0, True),   # exactly at boundary threshold, pic left
        (0.09, 0.3, 0.3, False), # below boundary threshold entirely
        (-0.5, 0.3, 0.3, False),
    ]
    df = spark.createDataFrame(
        [(x, l, r) for x, l, r, _ in rows], "x double, left_x double, right_x double"
    )
    got = [r.keep for r in df.select(_tailcut_keep(F.lit(0.2), F.lit(0.1)).alias("keep")).collect()]
    assert got == [e for *_, e in rows]


def test_asof_tie_click_at_purchase_ts(spark, tmp_path):
    """A click at exactly the purchase timestamp counts (inclusive as-of),
    and the latest qualifying click wins."""
    events = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (1, _ts("2024-01-01 11:00:00"), 1, "click", 1.0, "{}"),
            (2, _ts("2024-01-01 11:00:00"), 1, "purchase", 9.0, "{}"),
            (3, _ts("2024-01-01 12:00:00"), 2, "purchase", 9.0, "{}"),  # no click ever
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    events.write.parquet(path)
    eng = Engine(spark, str(tmp_path))
    out = {r.event_id: r for r in eng.run("join_asof").collect()}
    assert out[2].last_click_ts == _ts("2024-01-01 11:00:00")
    assert out[2].gap_us == 0
    assert out[3].last_click_ts is None and out[3].gap_us is None


def test_session_gap_boundary_is_exclusive(spark, tmp_path):
    """A gap of exactly 30 minutes does NOT split a session (> semantics,
    matching session_window's inactivity-gap rule)."""
    events = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
            (1, _ts("2024-01-01 10:30:00"), 1, "view", 1.0, "{}"),  # exactly 30m → same
            (2, _ts("2024-01-01 11:00:00.000001"), 1, "view", 1.0, "{}"),  # 30m+1us → new
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    events.write.parquet(str(tmp_path / "events.parquet"))
    eng = Engine(spark, str(tmp_path))
    sessions = eng.run("stream_session").collect()
    assert sorted(s.n_events for s in sessions) == [1, 2]


def test_late_drop_boundary_inclusive(spark, tmp_path):
    """An event exactly 10 minutes late is KEPT (>= watermark cutoff);
    one microsecond later is dropped."""
    events = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (1, _ts("2024-01-01 09:50:00"), 1, "click", 1.0, "{}"),  # exactly 10m late
            (2, _ts("2024-01-01 09:49:59.999999"), 1, "click", 1.0, "{}"),  # too late
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    events.write.parquet(str(tmp_path / "events.parquet"))
    eng = Engine(spark, str(tmp_path))
    kept = {r.event_id for r in eng.run("stream_late_drop").collect()}
    assert kept == {0, 1}


def test_um_is_exact_microseconds(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00.000001"),)], "ts timestamp_ntz"
    )
    assert df.select(um("ts").alias("u")).collect()[0].u == 1704067200000001
