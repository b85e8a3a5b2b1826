"""Batch EP pins — skip-gram symmetry + W1 shift identity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface36 as s36
from sap_cta_data_pipeline_spark.operators.surface36 import (
    events_skipgram_pairs,
    ml_wasserstein_drift,
)


def test_skipgram_symmetry_and_keep_probs(spark, sf_dir):
    rows = events_skipgram_pairs.__wrapped__(spark, sf_dir).collect()
    cnt = {(r.center, r.context, r.dist): r.n_pairs for r in rows}
    for (a, b, d), n in cnt.items():
        assert cnt.get((b, a, d)) == n, "skip-gram pairs are symmetric"
    for r in rows:
        assert 0.0 < r.center_keep_p <= 1.0
    # rarer centers keep more: keep_p is non-increasing in frequency
    from collections import defaultdict

    tot = defaultdict(int)
    for r in rows:
        tot[r.center] += r.n_pairs
    keep = {r.center: r.center_keep_p for r in rows}
    byfreq = sorted(tot, key=tot.get)
    for a, b in zip(byfreq, byfreq[1:]):
        assert keep[a] >= keep[b] - 1e-9


def test_wasserstein_constant_shift_identity(spark):
    # W1 between X and X + c is exactly c
    vals = [float(v) for v in (10, 20, 20, 35, 50, 80, 80, 120)]
    c = 7.5
    rows = [(i * 2, v) for i, v in enumerate(vals)] + [
        (i * 2 + 1, v + c) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    orig = s36.t
    try:
        s36.t = lambda spark_, sf_, name: df  # noqa: ARG005
        (r,) = ml_wasserstein_drift.__wrapped__(spark, "x").collect()
    finally:
        s36.t = orig
    assert r.n_ref == r.n_cur == len(vals)
    assert math.isclose(r.w1, c, abs_tol=1e-6)


def test_wasserstein_zero_for_identical(spark):
    vals = [float(v) for v in (1, 2, 3, 4, 5, 6)]
    rows = [(i * 2, v) for i, v in enumerate(vals)] + [
        (i * 2 + 1, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    orig = s36.t
    try:
        s36.t = lambda spark_, sf_, name: df  # noqa: ARG005
        (r,) = ml_wasserstein_drift.__wrapped__(spark, "x").collect()
    finally:
        s36.t = orig
    assert math.isclose(r.w1, 0.0, abs_tol=1e-9)
