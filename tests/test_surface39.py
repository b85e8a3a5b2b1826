"""Batch FH pins — MATTR closed form vs naive windows, permutation-
entropy regimes, runs-test extremes."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.surface39 as m39
from sap_cta_data_pipeline_spark.operators.surface39 import (
    stats_runs_test,
    text_ttr_mattr,
    ts_permutation_entropy,
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _plant_docs(monkeypatch, spark, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    monkeypatch.setattr(m39, "t", lambda s, sf, name: df)


def _plant_daily(monkeypatch, spark, counts):
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            k += 1
            rows.append((k, 1, "O", 1.0, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m39, "t", lambda s, sf, name: df)


def _naive_mattr(tokens, w):
    vals = [
        len(set(tokens[s : s + w])) / w
        for s in range(0, len(tokens) - w + 1)
    ]
    return sum(vals) / len(vals)


def test_mattr_degenerate_docs(spark, monkeypatch):
    const = " ".join(["x"] * 30)            # all same token -> 1/W
    distinct = " ".join(f"t{i}" for i in range(30))  # all distinct -> 1
    short = "too short"                      # < W tokens -> excluded
    _plant_docs(monkeypatch, spark, [const, distinct, short])
    rows = {r.doc_id: r for r in text_ttr_mattr.__wrapped__(spark, "x").collect()}
    assert set(rows) == {0, 1}
    assert math.isclose(rows[0].mattr, 1 / 25, abs_tol=1e-9)
    assert math.isclose(rows[1].mattr, 1.0, abs_tol=1e-9)
    assert math.isclose(rows[1].ttr, 1.0, abs_tol=1e-9)


def test_mattr_closed_form_equals_naive(spark, monkeypatch):
    toks = ("a b c a b d e a f g b c " * 5).split()  # 60 tokens, repeats
    _plant_docs(monkeypatch, spark, [" ".join(toks)])
    r = text_ttr_mattr.__wrapped__(spark, "x").collect()[0]
    assert r.n_tokens == 60
    assert math.isclose(r.mattr, round(_naive_mattr(toks, 25), 6), abs_tol=1e-6)


def test_permutation_entropy_monotone_is_zero(spark, monkeypatch):
    _plant_daily(monkeypatch, spark, list(range(1, 21)))
    rows = ts_permutation_entropy.__wrapped__(spark, "x").collect()
    assert [r.pattern for r in rows] == ["012"]
    assert rows[0].h_cum == 0.0


def test_permutation_entropy_sawtooth(spark, monkeypatch):
    # 1,2,1,2,... -> alternating patterns '120' (1,2,1: a<=b, d<a) wait:
    # triples: (1,2,1) -> b>a, d<b, d>=? a=1,d=1: a<=d and d<b -> '021';
    # (2,1,2) -> b<a, a<=d -> '102'; equal split -> H = ln2/ln6
    _plant_daily(monkeypatch, spark, [1, 2] * 12)
    rows = ts_permutation_entropy.__wrapped__(spark, "x").collect()
    pats = {r.pattern: r for r in rows}
    assert set(pats) == {"021", "102"}
    h = rows[-1].h_cum
    assert math.isclose(h, math.log(2) / math.log(6), abs_tol=1e-6)


def test_runs_alternating_and_blocks(spark, monkeypatch):
    # alternating around mean: 1,9,1,9,... (mean 5) -> runs = n
    _plant_daily(monkeypatch, spark, [1, 9] * 10)
    r = stats_runs_test.__wrapped__(spark, "x").collect()[0]
    assert (r.n1, r.n2, r.runs) == (10, 10, 20)
    assert r.z_stat > 3  # far too many runs

    # two blocks: 1*10 then 9*10 -> runs = 2
    _plant_daily(monkeypatch, spark, [1] * 10 + [9] * 10)
    r = stats_runs_test.__wrapped__(spark, "x").collect()[0]
    assert (r.n1, r.n2, r.runs) == (10, 10, 2)
    assert r.z_stat < -3  # far too few runs
