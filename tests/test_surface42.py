"""Batch FK pins — Durbin-Watson algebraic expansion vs a direct python
re-derivation, DW regime pins, HBOS planted-outlier rank."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.surface42 as m42
from sap_cta_data_pipeline_spark.operators.surface42 import (
    ml_hbos_outlier_topk,
    ts_durbin_watson,
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _plant_daily(monkeypatch, spark, counts):
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            k += 1
            rows.append((k, 1, "O", 1.0, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m42, "t", lambda s, sf, name: df)


def _dw_direct(xs):
    n = len(xs)
    ts = list(range(1, n + 1))
    st, sx = sum(ts), sum(xs)
    b = (n * sum(t * x for t, x in zip(ts, xs)) - st * sx) / (
        n * sum(t * t for t in ts) - st * st
    )
    a = sx / n - b * st / n
    e = [x - (a + b * t) for t, x in zip(ts, xs)]
    return sum(
        (e[i] - e[i - 1]) ** 2 for i in range(1, n)
    ) / sum(v * v for v in e)


def test_dw_matches_direct_rederivation(spark, monkeypatch):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    _plant_daily(monkeypatch, spark, xs)
    r = ts_durbin_watson.__wrapped__(spark, "x").collect()[0]
    assert r.n_days == 20
    assert math.isclose(r.dw, _dw_direct(xs), abs_tol=1e-5)


def test_dw_regimes(spark, monkeypatch):
    # two-block (strong positive serial corr of residuals) -> DW small
    _plant_daily(monkeypatch, spark, [2] * 10 + [12] * 10)
    lo = ts_durbin_watson.__wrapped__(spark, "x").collect()[0].dw
    assert lo < 1
    # alternating (negative serial corr) -> DW near 4
    _plant_daily(monkeypatch, spark, [2, 12] * 10)
    hi = ts_durbin_watson.__wrapped__(spark, "x").collect()[0].dw
    assert hi > 3


def test_hbos_planted_outlier_is_rank1(spark, monkeypatch):
    base = datetime(2020, 1, 1)
    rows = [
        (k, 1, "O", 100.0 + (k % 7), base, "3-MEDIUM") for k in range(1, 50)
    ]
    # lone extreme price in a rare priority
    rows.append((999, 1, "O", 90000.0, base, "1-URGENT"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m42, "t", lambda s, sf, name: df)
    out = ml_hbos_outlier_topk.__wrapped__(spark, "x").collect()
    assert out[0].o_orderkey == 999
    n = 50
    expect = -math.log(1 / n) - math.log(1 / n)
    assert math.isclose(out[0].hbos_score, expect, abs_tol=1e-5)
    # scores are non-increasing and ties break by key
    scores = [r.hbos_score for r in out]
    assert scores == sorted(scores, reverse=True)
