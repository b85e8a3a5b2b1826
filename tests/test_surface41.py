"""Batch FJ pins — Fellegi-Sunter m/u on a hand-built block, and the
split-conformal radius/coverage closed form."""

from __future__ import annotations

import math
from datetime import datetime

import sap_cta_data_pipeline_spark.operators.surface41 as m41
from sap_cta_data_pipeline_spark.operators.surface41 import (
    match_fs_weights,
    ml_conformal_interval_eval,
)

_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_fs_weights_planted(spark, monkeypatch):
    # one block (nation 0, shared 15-char prefix): custkeys 1,2
    # k=1: untouched (1%3!=0, 1%5!=0, 1%7!=0) -> perfect agreement
    # k=2: untouched too -> matches: both agree on all fields
    # non-match pairs (1,2),(2,1): name differs, segment differs, bal differs
    rows = [
        (1, "Customer#000000001", 0, 10.0, "AUTO"),
        (2, "Customer#000000002", 0, 20.0, "HOUSE"),
    ]
    df = spark.createDataFrame(rows, _C_SCHEMA)
    monkeypatch.setattr(m41, "t", lambda s, sf, name: df)
    out = {r.field: r for r in match_fs_weights.__wrapped__(spark, "x").collect()}
    r = out["name"]
    assert (r.n_pairs, r.n_match) == (4, 2)
    # m = (2+1)/(2+2) = .75 ; u = (0+1)/(2+2) = .25
    assert math.isclose(r.m_prob, 0.75, abs_tol=1e-9)
    assert math.isclose(r.u_prob, 0.25, abs_tol=1e-9)
    assert math.isclose(r.w_agree, math.log(3), abs_tol=1e-6)
    assert math.isclose(r.w_disagree, math.log((0.25) / (0.75)), abs_tol=1e-6)
    # all three fields have identical planted counts here
    assert out["segment"].m_prob == out["acctbal"].m_prob == 0.75


def test_fs_weights_perturbation_rates(spark, monkeypatch):
    # 30 customers in one nation, one prefix block of 10 (keys 10..19):
    # every 3rd name perturbed -> match-name agreement < 1
    rows = [
        (k, f"Customer#{k:09d}", 0, float(k), "SEG")
        for k in range(10, 20)
    ]
    df = spark.createDataFrame(rows, _C_SCHEMA)
    monkeypatch.setattr(m41, "t", lambda s, sf, name: df)
    out = {r.field: r for r in match_fs_weights.__wrapped__(spark, "x").collect()}
    r = out["name"]
    # keys 12,15,18 perturbed: 7/10 matches agree -> m=(7+1)/12
    assert r.n_match == 10
    assert math.isclose(r.m_prob, 8 / 12, abs_tol=1e-6)
    # segment matches: every 5th (10,15) perturbed -> 8/10 -> (8+1)/12
    assert math.isclose(out["segment"].m_prob, 9 / 12, abs_tol=1e-6)
    # non-match segment pairs all agree ('SEG'='SEG') except vs perturbed
    assert out["segment"].u_prob > 0.5


def test_conformal_planted_radius_and_coverage(spark, monkeypatch):
    train_ts, test_ts = datetime(2024, 1, 2), datetime(2024, 1, 20)
    # calibration: values 0..9 dollars (mean 4.5) -> residuals floor to
    # cents: |v*100 - 450| in {50,150,...,450} -> 10 distinct
    rows = [(i, train_ts, 1, "t", float(i), "{}") for i in range(10)]
    # test: 4.0 (resid 50 <= q) covered; 30.0 (resid 2550) not
    rows += [(100, test_ts, 1, "t", 4.0, "{}"),
             (101, test_ts, 1, "t", 30.0, "{}")]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(m41, "t", lambda s, sf, name: df)
    r = ml_conformal_interval_eval.__wrapped__(spark, "x").collect()[0]
    assert r.n_cal == 10 and r.n_test == 2
    # k = ceil(11*0.9) = 10 -> q = max residual = 450 cents = 4.5
    assert math.isclose(r.q_alpha, 4.5, abs_tol=1e-9)
    assert math.isclose(r.coverage, 0.5, abs_tol=1e-9)
