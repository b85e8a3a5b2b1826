"""Batch FL pins — posting-intersection correctness on a planted corpus
and SES-grid regime pins."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.surface43 as m43
from sap_cta_data_pipeline_spark.operators.surface43 import (
    text_inverted_index_lookup,
    ts_ses_grid_backtest,
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_inverted_index_planted(spark, monkeypatch):
    # df(alpha)=3 > df(bravo)=2 > others; only doc 2 has both terms
    docs = [
        (1, "alpha alpha xx"),
        (2, "alpha bravo bravo yy"),
        (3, "alpha zz"),
        (4, "bravo charlie"),
    ]
    # make bravo df=2 vs charlie df=1; terms = alpha (df 3... doc4 no alpha)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(m43, "t", lambda s, sf, name: df)
    out = text_inverted_index_lookup.__wrapped__(spark, "x").collect()
    # terms: alpha (df 3), bravo (df 2); intersection = doc 2 only
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.tf_a, r.tf_b) == (2, 1, 2)


def _plant_daily(monkeypatch, spark, counts):
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            k += 1
            rows.append((k, 1, "O", 1.0, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m43, "t", lambda s, sf, name: df)


def test_ses_grid_constant_series_all_zero(spark, monkeypatch):
    _plant_daily(monkeypatch, spark, [5] * 15)
    rows = ts_ses_grid_backtest.__wrapped__(spark, "x").collect()
    assert len(rows) == 9
    assert all(r.mse == 0.0 for r in rows)


def test_ses_grid_alternating_prefers_small_alpha(spark, monkeypatch):
    _plant_daily(monkeypatch, spark, [2, 8] * 10)
    rows = {round(r.alpha, 1): r for r in ts_ses_grid_backtest.__wrapped__(spark, "x").collect()}
    best = min(rows.values(), key=lambda r: (r.mse, r.alpha))
    assert best.rk == 1
    assert best.alpha <= 0.3  # mean-reverting signal -> smooth hard
    # higher alpha chases the oscillation -> larger error
    assert rows[0.9].mse > rows[0.2].mse


def test_ses_grid_fold_matches_direct(spark, monkeypatch):
    xs = [3, 7, 4, 9, 2, 8, 6, 1, 5, 7]
    _plant_daily(monkeypatch, spark, xs)
    rows = {round(r.alpha, 1): r.mse for r in ts_ses_grid_backtest.__wrapped__(spark, "x").collect()}
    for t10 in (1, 5, 9):
        a = t10 / 10.0
        s, sse = float(xs[0]), 0.0
        for x in xs[1:]:
            sse += (x - s) ** 2
            s = a * x + (1 - a) * s
        assert math.isclose(rows[round(a, 1)], sse / (len(xs) - 1), abs_tol=1e-5)
