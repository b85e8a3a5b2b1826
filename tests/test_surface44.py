"""Batch FM pins — demand-class quadrants on planted SKUs, SPC chart
closed forms (in-control all-OK, spiked day flags)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.surface44 as m44
from sap_cta_data_pipeline_spark.operators.surface44 import (
    part_demand_classification,
    stats_spc_xbar_r,
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_demand_classes_planted(spark, monkeypatch):
    rows = []
    # part 1: 1 unit every month for 12 months -> ADI=1, CV2=0 -> smooth
    for mth in range(12):
        rows.append((mth, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime(2020, 1 + mth % 12, 5)))
    # part 2: one demand in the whole year -> ADI=12 -> intermittent
    rows.append((100, 2, 1, 1, 4.0, 1.0, 0.0, 0.0, "N", "O",
                 datetime(2020, 3, 5)))
    df = spark.createDataFrame(rows, _LI_SCHEMA)
    monkeypatch.setattr(m44, "t", lambda s, sf, name: df)
    out = {r.demand_class: r for r in part_demand_classification.__wrapped__(spark, "x").collect()}
    assert out["smooth"].n_parts == 1
    assert math.isclose(out["smooth"].avg_adi, 1.0, abs_tol=1e-9)
    assert math.isclose(out["smooth"].avg_cv2, 0.0, abs_tol=1e-9)
    assert out["intermittent"].n_parts == 1
    assert math.isclose(out["intermittent"].avg_adi, 12.0, abs_tol=1e-9)


def _plant_orders(monkeypatch, spark, day_prices):
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    for d, prices in enumerate(day_prices):
        for p in prices:
            k += 1
            rows.append((k, 1, "O", p, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m44, "t", lambda s, sf, name: df)


def test_spc_in_control_all_ok(spark, monkeypatch):
    # identical subgroups -> rbar=0, every xbar == grand mean -> OK
    _plant_orders(monkeypatch, spark, [[10.0, 11.0, 12.0, 13.0, 14.0]] * 8)
    rows = stats_spc_xbar_r.__wrapped__(spark, "x").collect()
    assert len(rows) == 8
    assert all(r.rule == "OK" for r in rows)
    assert all(math.isclose(r.xbar, 12.0, abs_tol=1e-9) for r in rows)


def test_spc_spiked_day_flags(spark, monkeypatch):
    days = [[10.0, 11.0, 12.0, 13.0, 14.0]] * 8
    days.append([18.0, 19.0, 20.0, 21.0, 22.0])  # moderate shift -> X
    # grand: xbb = (8*12 + 20)/9 = 12.889, A2*rbar = 2.308
    # -> limits [10.58, 15.20]: normal days (12) OK, spike (20) X-flags
    _plant_orders(monkeypatch, spark, days)
    rows = {r.day: r for r in stats_spc_xbar_r.__wrapped__(spark, "x").collect()}
    flagged = [d for d, r in rows.items() if r.rule != "OK"]
    assert flagged == ["2020-01-09"]
    assert rows["2020-01-09"].rule == "X"  # range unchanged -> no R flag
