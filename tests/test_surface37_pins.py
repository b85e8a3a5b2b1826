"""Batch EQ pins — DeLong estimator replay + AUC cross-check;
burstiness on a planted bimodal corpus."""

from __future__ import annotations

import math

from sap_cta_data_pipeline_spark.operators.surface37 import (
    ml_auc_delong_se,
    text_term_burstiness,
)


def test_delong_matches_auc_lane_and_replay(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t
    from sap_cta_data_pipeline_spark.operators.ml_eval import ml_auc_roc

    (dl,) = ml_auc_delong_se.__wrapped__(spark, sf_dir).collect()
    (auc_row,) = ml_auc_roc.__wrapped__(spark, sf_dir).collect()
    assert math.isclose(dl.auc, auc_row.auc, abs_tol=2e-6), (
        "mean(V10) must equal the Mann-Whitney AUC"
    )
    assert dl.se_delong > 0
    # python replay from raw scores
    rows = t(spark, sf_dir, "events").select("value", "event_type").collect()
    pos = sorted(r.value for r in rows if r.event_type == "purchase")
    neg = sorted(r.value for r in rows if r.event_type != "purchase")
    import bisect

    def v10(s):
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        return (lo + 0.5 * (hi - lo)) / len(neg)

    def v01(s):
        lo = bisect.bisect_left(pos, s)
        hi = bisect.bisect_right(pos, s)
        return ((len(pos) - hi) + 0.5 * (hi - lo)) / len(pos)

    v10s = [v10(s) for s in pos]
    v01s = [v01(s) for s in neg]
    auc = sum(v10s) / len(v10s)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = math.sqrt(var(v10s) / len(pos) + var(v01s) / len(neg))
    assert math.isclose(dl.auc, round(auc, 6), abs_tol=2e-6)
    assert math.isclose(dl.se_delong, round(se, 6), abs_tol=2e-6)


def test_burstiness_planted(spark):
    import sap_cta_data_pipeline_spark.operators.surface37 as s37

    # 'even' appears once in every doc (Poisson-ish, VMR < 1.5);
    # 'burst' appears 25 times but only in one doc (very bursty)
    docs = [(i, "en", "even filler" + (" burst" * 25 if i == 0 else ""))
            for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    orig = s37.t
    try:
        s37.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = {
            r.term: r
            for r in text_term_burstiness.__wrapped__(spark, "x").collect()
        }
    finally:
        s37.t = orig
    assert not got["even"].bursty
    assert math.isclose(got["even"].vmr, 0.0, abs_tol=1e-6), (
        "constant 1-per-doc has zero variance"
    )
    assert got["burst"].bursty and got["burst"].vmr > 10
    # replay: burst total=25, D=25 -> mean 1, E[x^2]=625/25=25, var=24
    assert math.isclose(got["burst"].vmr, 24.0, abs_tol=1e-6)
