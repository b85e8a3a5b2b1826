"""Batch FE pins — planted closed-form values for the Wilcoxon
signed-rank z, McNemar's paired-binary χ², and the Cochran-Armitage
trend z (the oracle certifies engine parity; these certify the
STATISTICS against hand arithmetic)."""

from __future__ import annotations

import math
from datetime import datetime

import sap_cta_data_pipeline_spark.operators.stats_tests6 as m6
from sap_cta_data_pipeline_spark.operators.stats_tests6 import (
    stats_cochran_armitage,
    stats_mcnemar,
    stats_wilcoxon_signed_rank,
)

_SCHEMA = (
    "o_custkey long, o_totalprice double, o_orderdate timestamp, "
    "o_orderpriority string"
)
_B = datetime(1994, 6, 1)  # before the 1995-01-01 cutoff
_A = datetime(1996, 6, 1)  # after


def _plant(monkeypatch, spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    monkeypatch.setattr(m6, "t", lambda s, sf, name: df)


def test_wilcoxon_planted_all_positive_distinct(spark, monkeypatch):
    # per-customer d (cents): +10000, +3000, +2000; cust 4 ties out at 0
    rows = [
        (1, 100.0, _B, "x"), (1, 200.0, _A, "x"),
        (2, 100.0, _B, "x"), (2, 130.0, _A, "x"),
        (3, 50.0, _B, "x"), (3, 70.0, _A, "x"),
        (4, 10.0, _B, "x"), (4, 10.0, _A, "x"),
    ]
    _plant(monkeypatch, spark, rows)
    r = stats_wilcoxon_signed_rank.__wrapped__(spark, "x").collect()[0]
    assert r.n_pairs == 3
    # all diffs positive & distinct => W+ = n(n+1)/2 = 6
    assert r.w_plus == 6.0
    # z = (6 - 3) / sqrt(3*4*7/24) = 3 / sqrt(3.5)
    assert math.isclose(r.z_stat, 3 / math.sqrt(3.5), abs_tol=1e-6)


def test_wilcoxon_planted_ties_and_signs(spark, monkeypatch):
    # d: +100, -100 (tied |d| -> midrank 1.5 each), +300 (rank 3)
    rows = [
        (1, 1.0, _B, "x"), (1, 2.0, _A, "x"),
        (2, 2.0, _B, "x"), (2, 1.0, _A, "x"),
        (3, 1.0, _B, "x"), (3, 4.0, _A, "x"),
    ]
    _plant(monkeypatch, spark, rows)
    r = stats_wilcoxon_signed_rank.__wrapped__(spark, "x").collect()[0]
    assert r.n_pairs == 3
    assert r.w_plus == 4.5  # 1.5 + 3
    # mu = 3, sigma^2 = 3*4*7/24 - (2^3-2)/48 = 3.5 - 0.125
    assert math.isclose(
        r.z_stat, 1.5 / math.sqrt(3.5 - 6 / 48), abs_tol=1e-6
    )


def test_mcnemar_planted(spark, monkeypatch):
    rows = []
    # b = 3: URGENT before only
    for k in (1, 2, 3):
        rows += [(k, 1.0, _B, "1-URGENT"), (k, 1.0, _A, "5-LOW")]
    # c = 1: URGENT after only
    rows += [(4, 1.0, _B, "5-LOW"), (4, 1.0, _A, "1-URGENT")]
    # concordant yes/yes and no/no
    rows += [(5, 1.0, _B, "1-URGENT"), (5, 1.0, _A, "1-URGENT")]
    rows += [(6, 1.0, _B, "5-LOW"), (6, 1.0, _A, "5-LOW")]
    _plant(monkeypatch, spark, rows)
    r = stats_mcnemar.__wrapped__(spark, "x").collect()[0]
    assert (r.n_subjects, r.b_disc, r.c_disc) == (6, 3, 1)
    assert math.isclose(r.chi2, 1.0, abs_tol=1e-9)  # (3-1)^2/4
    assert math.isclose(r.chi2_cc, 0.25, abs_tol=1e-9)  # (|2|-1)^2/4


def test_cochran_armitage_planted_perfect_trend(spark, monkeypatch):
    big, small = 200000.0, 1000.0
    rows = [
        # 1992 (w=1): 0/2 big; 1993 (w=2): 1/2; 1994 (w=3): 2/2
        (1, small, datetime(1992, 3, 1), "x"),
        (2, small, datetime(1992, 9, 1), "x"),
        (3, big, datetime(1993, 3, 1), "x"),
        (4, small, datetime(1993, 9, 1), "x"),
        (5, big, datetime(1994, 3, 1), "x"),
        (6, big, datetime(1994, 9, 1), "x"),
    ]
    _plant(monkeypatch, spark, rows)
    r = stats_cochran_armitage.__wrapped__(spark, "x").collect()[0]
    assert (r.k, r.n_total) == (3, 6)
    assert r.pbar == 0.5
    # T - E = 8 - 6 = 2; Var = .25 * (28 - 144/6) = 1 -> z = 2
    assert math.isclose(r.z_stat, 2.0, abs_tol=1e-9)
