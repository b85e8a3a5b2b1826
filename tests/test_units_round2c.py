"""Unit tests for the round-2c addendum: composite TPC-H-shape queries and
the time-series lane (rollup hierarchy, OHLC, gap-fill, sweep-line
concurrency, z-score outliers). Differential parity vs DuckDB is covered by
driver_sim; these pin semantic invariants and plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES

from .test_plans import plan_text


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


# --- TPC-H composite shapes -------------------------------------------------

def test_q3_top10_ordered_and_filtered(q):
    rows = q("tpch_q3_shipping_priority").collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.orderdate < "1998-06-01" for r in rows)


def test_q3_plan_pushdown_and_topk(q):
    plan = plan_text(q("tpch_q3_shipping_priority"))
    assert "TakeOrderedAndProject" in plan
    assert "c_mktsegment" in plan and "o_orderdate" in plan and "l_shipdate" in plan
    assert "PushedFilters: [" in plan


def test_q5_nations_are_asian(q, spark, sf_dir):
    rows = q("tpch_q5_local_supplier_volume").collect()
    assert rows and all(r.revenue > 0 for r in rows)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia = {
        r.n_name
        for r in nation.join(
            region.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).collect()
    }
    assert {r.n_name for r in rows} <= asia


def test_q5_broadcasts_dims(q):
    assert "BroadcastHashJoin" in plan_text(q("tpch_q5_local_supplier_volume"), "simple")


def test_q10_top20_returned_revenue(q):
    rows = q("tpch_q10_returned_items").collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert "TakeOrderedAndProject" in plan_text(q("tpch_q10_returned_items"))


# --- time-series lane -------------------------------------------------------

def test_rollup_hierarchy_lossless(q, spark, sf_dir):
    day = q("ts_rollup_hierarchy")
    e = load_table(spark, sf_dir, "events")
    direct = (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).cast("string").alias("day"))
        .agg(
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    assert day.exceptAll(direct).count() == 0
    assert direct.exceptAll(day).count() == 0


def test_ohlc_bounds_and_single_shuffle(q):
    bars = q("ts_ohlc_bars")
    bad = bars.where(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
    )
    assert bad.count() == 0
    # min_by/max_by are algebraic aggregates: exactly one shuffle, no window
    assert plan_text(bars, "simple").count("Exchange") == 1


def test_gapfill_grid_is_dense_and_filled(q):
    g = q("ts_gapfill_locf")
    assert g.where(F.col("v_filled").isNull()).count() == 0
    # hours per series == (max - min)/3600s + 1 → the grid is gap-free
    spans = (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                (
                    F.unix_timestamp(F.max("hour"))
                    - F.unix_timestamp(F.min("hour"))
                )
                / 3600
                + 1
            ).cast("long").alias("expected"),
        )
        .collect()
    )
    assert spans and all(r.n == r.expected for r in spans)


def test_max_concurrent_vs_bruteforce(q, spark, sf_dir):
    got = {r.event_type: r.max_concurrent for r in q("events_max_concurrent").collect()}
    e = load_table(spark, sf_dir, "events")
    pdf = e.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t0"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value")).cast("long") * 1000000
        ).alias("t1"),
    ).toPandas()
    for etype, grp in pdf.groupby("event_type"):
        pts = sorted(
            [(t, 1) for t in grp.t0] + [(t, -1) for t in grp.t1]
        )
        best = cur = 0
        # group deltas per distinct timestamp, mirroring the operator
        import itertools

        for _, deltas in itertools.groupby(pts, key=lambda p: p[0]):
            cur += sum(d for _, d in deltas)
            best = max(best, cur)
        assert got[etype] == best


def test_zscore_outliers_exceed_threshold(q):
    rows = q("events_zscore_outliers").collect()
    assert rows and all(abs(r.z) > 2.5 for r in rows)
