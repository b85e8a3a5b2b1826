"""Batch FF pins — Theta-method identities and Hurst-exponent regime
pins on planted series (the oracle certifies engine parity; these
certify the METHODS against known behavior)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.timeseries5 as m5
from sap_cta_data_pipeline_spark.operators.timeseries5 import (
    ts_hurst_rs,
    ts_theta_forecast,
)

_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _plant_daily(monkeypatch, spark, counts):
    """One order row per unit of count on consecutive days."""
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            k += 1
            rows.append((k, 1, "O", 100.0, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _SCHEMA)
    monkeypatch.setattr(m5, "t", lambda s, sf, name: df)


def test_theta_constant_series_is_identity(spark, monkeypatch):
    _plant_daily(monkeypatch, spark, [5] * 20)
    rows = ts_theta_forecast.__wrapped__(spark, "x").collect()
    assert [r.h for r in rows] == list(range(1, 8))
    for r in rows:
        # constant series: trend b=0, a=5, theta2-line=5, SES=5
        assert math.isclose(r.lin_component, 5.0, abs_tol=1e-9)
        assert math.isclose(r.ses_level, 5.0, abs_tol=1e-9)
        assert math.isclose(r.forecast, 5.0, abs_tol=1e-9)


def test_theta_linear_ramp_extrapolates_trend(spark, monkeypatch):
    # counts 1..20: perfect line -> theta2 residual line == same line,
    # SES lags but lin_component must hit a + b*(n+h) = n + h exactly
    _plant_daily(monkeypatch, spark, list(range(1, 21)))
    rows = ts_theta_forecast.__wrapped__(spark, "x").collect()
    for r in rows:
        assert math.isclose(r.lin_component, 20 + r.h, abs_tol=1e-6)
        # forecast averages lin with flat SES -> below the line
        assert r.forecast <= r.lin_component + 1e-9


def test_hurst_ramp_is_persistent(spark, monkeypatch):
    # strongly trending series -> H near 1
    _plant_daily(monkeypatch, spark, [1 + i for i in range(128)])
    r = ts_hurst_rs.__wrapped__(spark, "x").collect()[0]
    assert r.n_days == 128
    assert r.hurst > 0.85


def test_hurst_alternating_is_antipersistent(spark, monkeypatch):
    # period-2 oscillation -> strongly mean-reverting, H well below 0.5
    _plant_daily(monkeypatch, spark, [10 + (i % 2) * 5 for i in range(128)])
    r = ts_hurst_rs.__wrapped__(spark, "x").collect()[0]
    assert r.hurst < 0.35
    # every block size has full blocks at n=128
    assert all(v is not None for v in (r.rs_8, r.rs_16, r.rs_32, r.rs_64))
