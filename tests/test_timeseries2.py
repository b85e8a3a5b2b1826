"""Known-value pins for batch CJ (oracles certify cross-engine equality;
these pin the math on signed synthetic series the fixture tables can't
produce — orders revenue is nonnegative, so the interesting drawdown and
band-breach paths need a hand-built frame)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest


def _orders_dir(spark, days: list[float]) -> str:
    """Write a synthetic orders.parquet with one order per day carrying
    the given totals; days start 2024-01-01."""
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(len(days)),
            "o_custkey": [1] * len(days),
            "o_orderstatus": ["F"] * len(days),
            "o_totalprice": days,
            "o_orderdate": [base + pd.Timedelta(days=i) for i in range(len(days))],
            "o_orderpriority": ["1-URGENT"] * len(days),
        }
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "orders.parquet"))
    return d


def test_drawdown_on_signed_series(spark):
    """Cumulative path 10,30,25,15,35: peak path 10,30,30,30,35 →
    drawdowns 0,0,5,15,0; max 15 at day index 3, pct 15/30."""
    from sap_cta_data_pipeline_spark.operators.timeseries2 import ts_drawdown_max

    d = _orders_dir(spark, [10.0, 20.0, -5.0, -10.0, 20.0])
    r = ts_drawdown_max(spark, d).collect()[0]
    assert r.max_drawdown == 15.0
    assert r.max_drawdown_pct == pytest.approx(0.5)
    assert r.trough_day == "2024-01-04"


def test_stl_seasonal_sums_to_zero_and_identity(spark):
    """Seasonal components sum to ~0 over the week, and
    trend+seasonal+residual reconstructs revenue wherever trend exists."""
    from sap_cta_data_pipeline_spark.operators.timeseries2 import (
        ts_stl_decompose_daily,
    )

    # 4 weeks with a deterministic weekly pattern + linear trend
    days = [100.0 + 2 * i + [0, 5, -5, 10, -10, 3, -3][i % 7] for i in range(28)]
    d = _orders_dir(spark, days)
    rows = ts_stl_decompose_daily(spark, d).collect()
    assert len(rows) == 28
    seas = {}
    for r in rows:
        if r.trend is not None:
            assert r.revenue == pytest.approx(
                r.trend + r.seasonal + r.residual, abs=1e-4
            )
        seas[r.day] = r.seasonal
    week = [r.seasonal for r in rows[:7]]
    assert sum(week) == pytest.approx(0.0, abs=1e-4)
    # edge days (first/last 3) must have NULL trend — no partial windows
    by_day = sorted(rows, key=lambda r: r.day)
    assert all(r.trend is None for r in by_day[:3] + by_day[-3:])
    assert all(r.trend is not None for r in by_day[3:-3])


def test_bollinger_full_windows_only_and_breach_sign(spark):
    from sap_cta_data_pipeline_spark.operators.timeseries2 import (
        ts_bollinger_breach,
    )

    # 25 flat days then a spike: only days 20..26 emit; the spike breaches up
    days = [100.0] * 25 + [500.0]
    d = _orders_dir(spark, days)
    rows = sorted(ts_bollinger_breach(spark, d).collect(), key=lambda r: r.day)
    assert len(rows) == 26 - 19  # full 20-day windows only
    assert rows[-1].breach == 1 and rows[-1].revenue == 500.0
    assert all(r.breach == 0 for r in rows[:-1])
