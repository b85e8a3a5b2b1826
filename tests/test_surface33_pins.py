"""Batch EM pins — FE invariance to absorbed effects; Haar energy
accounting + planted alternating series."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface33 as s33
from sap_cta_data_pipeline_spark.operators.surface33 import (
    orders_panel_within_estimator,
    ts_haar_wavelet_energy,
)


def test_within_estimator_invariance(spark, sf_dir):
    base = orders_panel_within_estimator.__wrapped__(spark, sf_dir).collect()[0]
    assert base.n_obs > 0
    assert 0.0 <= base.r2_within <= 1.0

    # shifting every order's price by a NATION-level factor changes
    # nation means only — the within beta must not move. Emulate by
    # monkeypatching the loader with a scaled orders table.
    from sap_cta_data_pipeline_spark.catalog import load_table

    def scaled(spark_, sf_, name):
        df = load_table(spark_, sf_, name)
        if name == "orders":
            # deterministic per-custkey-nation shift applied via join in
            # the lane itself is nation-grain; emulate a pure nation
            # effect with a multiplicative factor on price by custkey%25
            # — custkey%25 is NOT nation, so instead scale ALL prices by
            # e (a pure GRAND shift: ln adds 1 everywhere) — absorbed.
            return df.withColumn(
                "o_totalprice", F.col("o_totalprice") * float(math.e)
            )
        return df

    orig = s33.t
    try:
        s33.t = scaled
        shifted = orders_panel_within_estimator.__wrapped__(spark, sf_dir).collect()[0]
    finally:
        s33.t = orig
    # a global multiplicative shift adds a constant to ln(y): absorbed
    # by the grand/nation/month demeaning -> beta identical
    assert math.isclose(shifted.beta_within, base.beta_within, abs_tol=5e-4)


def test_haar_energy_accounting(spark, sf_dir):
    rows = ts_haar_wavelet_energy.__wrapped__(spark, sf_dir).collect()
    assert sorted(r.level for r in rows) == [0, 1, 2, 3]
    assert math.isclose(sum(r.energy_share for r in rows), 1.0, abs_tol=1e-5)
    by = {r.level: r for r in rows}
    # each level halves the coefficient count; approx == level 3 count
    assert by[1].n_coeffs == 2 * by[2].n_coeffs == 4 * by[3].n_coeffs
    assert by[0].n_coeffs == by[3].n_coeffs
    assert all(0.0 <= r.energy_share <= 1.0 for r in rows)


def test_haar_alternating_series_all_level1(spark):
    # y = +1, -1, +1, ... : every pair averages to 0 -> ALL energy in
    # the level-1 details
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), float(1 if i % 2 == 0 else -1))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "day date, revenue double")
    orig = s33._daily_series
    try:
        s33._daily_series = lambda spark_, sf_: df  # noqa: ARG005
        got = {r.level: r for r in ts_haar_wavelet_energy.__wrapped__(spark, "x").collect()}
    finally:
        s33._daily_series = orig
    assert math.isclose(got[1].energy_share, 1.0, abs_tol=1e-9)
    for lv in (0, 2, 3):
        assert math.isclose(got[lv].energy_share, 0.0, abs_tol=1e-9)
