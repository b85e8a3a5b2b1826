"""Batch DQ pins — the engine-vs-engine oracle proves Spark and DuckDB
agree; these pins prove the agreed value IS Holt-Winters / Theil–Sen by
replaying each estimator in pure Python on the same inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sap_cta_data_pipeline_spark.catalog import load_table as t
from sap_cta_data_pipeline_spark.operators.timeseries3 import (
    _HW_A,
    _HW_B,
    _HW_G,
    _HW_M,
    stats_theilsen_trend,
    ts_holt_winters_additive,
)


def _monthly_cents(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("c"))
        .orderBy("priority", "month")
        .collect()
    )


def test_holt_winters_matches_python_replay(spark, sf_dir):
    series: dict[str, list[float]] = {}
    for r in _monthly_cents(spark, sf_dir):
        series.setdefault(r.priority, []).append(r.c / 100.0)
    got = {
        r.priority: r
        for r in ts_holt_winters_additive.__wrapped__(spark, sf_dir).collect()
    }
    a, b, g, m = _HW_A, _HW_B, _HW_G, _HW_M
    for pri, vals in series.items():
        if len(vals) < m + 2:
            assert pri not in got
            continue
        l0 = sum(vals[:m]) / m  # noqa: E741
        lvl, tr, seas = l0, 0.0, [v - l0 for v in vals[:m]]
        for y in vals[m:]:
            s_cur = seas.pop(0)
            new_l = a * (y - s_cur) + (1 - a) * (lvl + tr)
            tr = b * (new_l - lvl) + (1 - b) * tr
            seas.append(g * (y - new_l) + (1 - g) * s_cur)
            lvl = new_l
        row = got[pri]
        assert row.n_months == len(vals)
        assert row.level == pytest.approx(lvl, abs=2e-6)
        assert row.trend == pytest.approx(tr, abs=2e-6)
        assert row.season_next == pytest.approx(seas[0], abs=2e-6)
        assert row.forecast_1 == pytest.approx(lvl + tr + seas[0], abs=4e-6)


def test_theilsen_matches_python_replay(spark, sf_dir):
    import statistics

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rows = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("c"))
        .collect()
    )
    by_nation: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append((r.t, r.c))
    got = {
        r.nation: r for r in stats_theilsen_trend.__wrapped__(spark, sf_dir).collect()
    }
    for nation, pts in by_nation.items():
        pts.sort()
        slopes = [
            (float(c2) - float(c1)) / (t2 - t1) / 100
            for i, (t1, c1) in enumerate(pts)
            for (t2, c2) in pts[i + 1 :]
        ]
        med = statistics.median(slopes)
        icept = statistics.median(c1 / 100 - med * t1 for t1, c1 in pts)
        row = got[nation]
        assert row.n_pairs == len(slopes)
        assert row.slope == pytest.approx(med, abs=2e-6)
        assert row.intercept == pytest.approx(icept, abs=2e-6)
