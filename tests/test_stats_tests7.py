"""Batch FT pins — Welch F* reduces to t² at k=2; TOST verdicts on
identical vs shifted arms."""

from __future__ import annotations

import math
from datetime import datetime

import sap_cta_data_pipeline_spark.operators.stats_tests7 as m7
from sap_cta_data_pipeline_spark.operators.stats_tests7 import (
    stats_tost_equivalence,
    stats_welch_anova,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_TS = datetime(2024, 1, 5)


def _plant(monkeypatch, spark, rows):
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(m7, "t", lambda s, sf, name: df)


def test_welch_two_groups_is_t_squared(spark, monkeypatch):
    a = [1.0, 2.0, 3.0, 4.0]          # mean 2.5, var 5/3
    b = [10.0, 14.0, 18.0]            # mean 14, var 16
    rows = [(i, _TS, 1, "a", v, "{}") for i, v in enumerate(a)]
    rows += [(100 + i, _TS, 1, "b", v, "{}") for i, v in enumerate(b)]
    _plant(monkeypatch, spark, rows)
    r = stats_welch_anova.__wrapped__(spark, "x").collect()[0]
    assert r.k == 2
    # Welch t on cents: se^2 = var_a/n_a + var_b/n_b
    ma, mb = 250.0, 1400.0
    va = (sum((x * 100 - ma) ** 2 for x in a)) / 3
    vb = (sum((x * 100 - mb) ** 2 for x in b)) / 2
    tt = (mb - ma) / math.sqrt(va / 4 + vb / 3)
    assert math.isclose(r.f_star, tt * tt, rel_tol=1e-4)


def test_tost_identical_arms_equivalent(spark, monkeypatch):
    # users 0..19: identical per-user spend in both arms, many users so
    # se is tiny relative to the 5% margin
    rows = [
        (i, _TS, u, "e", 10.0 + (u % 5) * 0.01, "{}")
        for i, u in enumerate(range(40))
    ]
    _plant(monkeypatch, spark, rows)
    r = stats_tost_equivalence.__wrapped__(spark, "x").collect()[0]
    assert r.equivalent is True
    assert abs(r.diff_dollars) < r.margin_dollars


def test_tost_shifted_arm_not_equivalent(spark, monkeypatch):
    # even users (arm 1) spend 2x: far outside the 5% margin
    rows = []
    for i, u in enumerate(range(40)):
        v = (20.0 if u % 2 == 0 else 10.0) + (u % 7) * 0.01
        rows.append((i, _TS, u, "e", v, "{}"))
    _plant(monkeypatch, spark, rows)
    r = stats_tost_equivalence.__wrapped__(spark, "x").collect()[0]
    assert r.equivalent is False
    assert r.diff_dollars > r.margin_dollars
