"""Batch EH pins — Fourier projection identities on a planted pure
harmonic, and shuffle-balance accounting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface28 as s28
from sap_cta_data_pipeline_spark.operators.surface28 import (
    _P,
    profile_shuffle_balance,
    ts_fourier_seasonal_fit,
)


def test_fourier_recovers_planted_harmonic(spark):
    # y_i = 10 + 4 cos(2π i/7) + 3 sin(2π·2·i/7) over 10 full weeks:
    # exact orthogonality -> a1≈4, b2≈3, everything else ≈0, R²≈1
    import datetime

    n = 70
    rows = [
        (
            datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
            10.0
            + 4.0 * math.cos(2 * math.pi * i / 7)
            + 3.0 * math.sin(2 * math.pi * 2 * i / 7),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "day date, revenue double")
    orig = s28._daily_series
    try:
        s28._daily_series = lambda spark_, sf_: df  # noqa: ARG005
        got = {
            r.k: r for r in ts_fourier_seasonal_fit.__wrapped__(spark, "x").collect()
        }
    finally:
        s28._daily_series = orig
    assert math.isclose(got[1].a, 4.0, abs_tol=1e-3)
    assert math.isclose(got[2].b, 3.0, abs_tol=1e-3)
    assert abs(got[1].b) < 1e-3 and abs(got[2].a) < 1e-3
    assert abs(got[3].amplitude) < 1e-3
    assert got[1].r2 > 0.999
    assert got[1].n_days == n


def test_fourier_lane_shape(spark, sf_dir):
    rows = ts_fourier_seasonal_fit.__wrapped__(spark, sf_dir).collect()
    assert sorted(r.k for r in rows) == [1, 2, 3]
    r2s = {r.r2 for r in rows}
    assert len(r2s) == 1
    assert all(-1.0 <= r.r2 <= 1.0 for r in rows)
    for r in rows:
        assert math.isclose(
            r.amplitude, round(math.hypot(r.a, r.b), 4), abs_tol=2e-4
        )


def test_shuffle_balance_accounting(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t

    rows = profile_shuffle_balance.__wrapped__(spark, sf_dir).collect()
    assert len(rows) <= _P
    total = sum(r.n_rows for r in rows)
    assert total == t(spark, sf_dir, "lineitem").count()
    max_skew = {r.max_skew for r in rows}
    assert len(max_skew) == 1
    best = max(r.balance for r in rows)
    assert math.isclose(best, max_skew.pop(), abs_tol=2e-6)
    # order keys are uniform-ish: hash layout must be near-balanced
    assert max(r.balance for r in rows) < 1.5
