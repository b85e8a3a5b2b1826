"""Batch FI pins — pinball-loss exact values + median optimality, and
modularity closed forms (two triangles = 1/2, one community = 0)."""

from __future__ import annotations

import math
from datetime import datetime

import sap_cta_data_pipeline_spark.operators.surface40 as m40
from sap_cta_data_pipeline_spark.operators.surface40 import (
    graph_modularity,
    ml_pinball_loss_eval,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_TRAIN = datetime(2024, 1, 2)
_TEST = datetime(2024, 1, 20)


def test_pinball_planted_exact(spark, monkeypatch):
    # train values 1..9 dollars -> q(.1)=1, q(.5)=5, q(.9)=9 (lower qtile)
    rows = [
        (i, _TRAIN, 1, "t", float(i), "{}") for i in range(1, 10)
    ]
    # test: two observations 4 and 8
    rows += [(100, _TEST, 1, "t", 4.0, "{}"), (101, _TEST, 1, "t", 8.0, "{}")]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(m40, "t", lambda s, sf, name: df)
    out = {
        round(r.tau, 1): r
        for r in ml_pinball_loss_eval.__wrapped__(spark, "x").collect()
    }
    assert out[0.1].q_tau == 1.0 and out[0.5].q_tau == 5.0 and out[0.9].q_tau == 9.0
    # tau=.5, q=5: losses .5*|4-5|=.5, .5*|8-5|=1.5 -> avg 1.0
    assert math.isclose(out[0.5].avg_pinball, 1.0, abs_tol=1e-9)
    # tau=.1, q=1: y>=q both: .1*(3) + .1*(7) -> avg .5
    assert math.isclose(out[0.1].avg_pinball, 0.5, abs_tol=1e-9)
    # tau=.9, q=9: y<q both: .1*(5) + .1*(1) -> avg .3
    assert math.isclose(out[0.9].avg_pinball, 0.3, abs_tol=1e-9)


def _plant_edges(monkeypatch, spark, edges, brand_of):
    e = spark.createDataFrame(edges, "u long, v long")
    p = spark.createDataFrame(
        [(k, b) for k, b in brand_of.items()], "p_partkey long, p_brand string"
    )
    monkeypatch.setattr(m40, "_edges", lambda s, sf: e)
    monkeypatch.setattr(m40, "t", lambda s, sf, name: p)


def test_modularity_two_triangles(spark, monkeypatch):
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    brands = {1: "A", 2: "A", 3: "A", 4: "B", 5: "B", 6: "B"}
    _plant_edges(monkeypatch, spark, edges, brands)
    r = graph_modularity.__wrapped__(spark, "x").collect()[0]
    assert (r.m_edges, r.intra_edges, r.n_communities) == (6, 6, 2)
    # Q = 1 - 2*(6/12)^2 = 0.5
    assert math.isclose(r.q_modularity, 0.5, abs_tol=1e-9)


def test_modularity_single_community_is_zero(spark, monkeypatch):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    brands = {1: "A", 2: "A", 3: "A", 4: "A"}
    _plant_edges(monkeypatch, spark, edges, brands)
    r = graph_modularity.__wrapped__(spark, "x").collect()[0]
    assert r.intra_edges == r.m_edges == 4
    # all intra: Q = 1 - sum(d_c)^2/(4m^2) = 1 - (2m)^2/(4m^2) = 0
    assert math.isclose(r.q_modularity, 0.0, abs_tol=1e-9)
