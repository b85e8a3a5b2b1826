"""Batch EA pins — Shapley axioms and onion-ratio edge semantics on
planted corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface22 as s22
from sap_cta_data_pipeline_spark.operators.surface22 import (
    events_attribution_shapley,
    text_dedup_onion_ratio,
)


def test_shapley_efficiency_axiom(spark, sf_dir):
    r = events_attribution_shapley.__wrapped__(spark, sf_dir).collect()[0]
    # efficiency: total credit = v(grand coalition) - v(empty)
    assert math.isclose(
        r.phi_click + r.phi_view + r.phi_signup,
        r.v_grand - r.v_empty,
        abs_tol=5e-6,
    )
    assert r.n_users > 0


def test_shapley_dummy_and_symmetry_on_planted(spark):
    # planted game: view NEVER changes conversion (dummy -> phi = 0);
    # click and signup are symmetric (equal phi)
    rows = []
    uid = 0
    # 8 coalition cells x 10 users; conversion depends ONLY on
    # |{click, signup} ∩ S| (0 -> 0%, 1 -> 50%, 2 -> 100%)
    import datetime

    for code in range(8):
        k = (1 if code & 1 else 0) + (1 if code & 4 else 0)
        for u in range(10):
            uid += 1
            if code & 1:
                rows.append((uid, "click"))
            if code & 2:
                rows.append((uid, "view"))
            if code & 4:
                rows.append((uid, "signup"))
            converted = (k == 2) or (k == 1 and u < 5)
            if converted:
                rows.append((uid, "purchase"))
            if not rows or rows[-1][0] != uid:
                rows.append((uid, "error"))  # ensure user exists
    df = spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1), u, et, 0.0, "{}")
            for i, (u, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    orig = s22.t
    try:
        s22.t = lambda spark_, sf_, name: df  # noqa: ARG005
        r = events_attribution_shapley.__wrapped__(spark, "x").collect()[0]
    finally:
        s22.t = orig
    assert math.isclose(r.phi_view, 0.0, abs_tol=1e-6), "dummy channel"
    assert math.isclose(r.phi_click, r.phi_signup, abs_tol=1e-6), "symmetry"
    assert r.phi_click > 0


def test_onion_ratio_planted(spark):
    # doc 0 and 1 share an identical 10-token half; doc 2 is unique
    shared = " ".join(f"s{i}" for i in range(10))
    u0 = " ".join(f"a{i}" for i in range(10))
    u1 = " ".join(f"b{i}" for i in range(10))
    u2 = " ".join(f"c{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (0, "en", f"{shared} {u0}"),
            (1, "en", f"{shared} {u1}"),
            (2, "en", u2),
        ],
        "doc_id long, lang string, text string",
    )
    orig = s22.t
    try:
        s22.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = {
            r.doc_id: r
            for r in text_dedup_onion_ratio.__wrapped__(spark, "x").collect()
        }
    finally:
        s22.t = orig
    # docs 0/1: 16 grams each, 6 shared (the 5-grams fully inside the
    # shared half: positions 1..6 of 20 tokens)
    assert got[0].n_grams == 16 and got[1].n_grams == 16
    assert got[0].n_shared == 6 and got[1].n_shared == 6
    assert not got[2].n_shared
    assert got[2].keep and got[0].keep  # 6/16 = 0.375 <= 0.5
    assert math.isclose(got[0].dup_ratio, 0.375, abs_tol=1e-6)


def test_onion_ratio_lane_consistency(spark, sf_dir):
    out = text_dedup_onion_ratio.__wrapped__(spark, sf_dir)
    bad = out.filter(
        (F.col("dup_ratio") < 0) | (F.col("dup_ratio") > 1)
        | (F.col("n_shared") > F.col("n_grams"))
    )
    assert bad.count() == 0
