"""Batch DX pins — calendar clamp literals and SHAP axioms."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.surface20 import (
    fn_interval_calendar_arith,
    ml_shap_linear_exact,
)


def test_month_add_clamps_to_month_end(spark):
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 31),),  # leap Feb
            (datetime.date(2023, 1, 31),),  # non-leap Feb
            (datetime.date(2024, 3, 31),),  # 30-day April
            (datetime.date(2024, 2, 29),),  # leap day + 1y
        ],
        "d date",
    )
    got = df.select(
        F.add_months("d", 1).cast("string").alias("m1"),
        F.add_months("d", 12).cast("string").alias("y1"),
    ).collect()
    assert [r.m1 for r in got] == [
        "2024-02-29",
        "2023-02-28",
        "2024-04-30",
        "2024-03-29",
    ]
    assert got[3].y1 == "2025-02-28"  # leap day + 1 year clamps
    # DuckDB agrees on every case (the oracle's operator)
    import duckdb

    for d, want in [
        ("2024-01-31", "2024-02-29"),
        ("2023-01-31", "2023-02-28"),
        ("2024-03-31", "2024-04-30"),
    ]:
        (r,) = duckdb.sql(
            f"select CAST(CAST(DATE '{d}' + INTERVAL 1 MONTH AS DATE) AS VARCHAR)"
        ).fetchone()
        assert r == want


def test_interval_lane_days_to_month_end(spark, sf_dir):
    rows = fn_interval_calendar_arith.__wrapped__(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.days_to_month_end <= 31
        assert 1 <= r.q <= 4
        # plus_45d really is +45 days
        d = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        assert (
            datetime.date.fromisoformat(r.plus_45d) - d
        ).days == 45


def test_shap_additivity_and_importance(spark, sf_dir):
    # additivity: mean phi over ALL rows is 0 by construction (phi is
    # centered), so the priority-weighted mean of mean_shap must be ~0
    rows = ml_shap_linear_exact.__wrapped__(spark, sf_dir).collect()
    total = sum(r.n_orders for r in rows)
    w1 = sum(r.mean_shap_x1 * r.n_orders for r in rows) / total
    w2 = sum(r.mean_shap_x2 * r.n_orders for r in rows) / total
    assert math.isclose(w1, 0.0, abs_tol=1e-3)
    assert math.isclose(w2, 0.0, abs_tol=1e-3)
    # importance is non-negative and dominates the directional mean
    for r in rows:
        assert r.mean_abs_shap_x1 >= abs(r.mean_shap_x1) - 1e-9
        assert r.mean_abs_shap_x2 >= abs(r.mean_shap_x2) - 1e-9
