"""Batch EE pins — Kneser-Ney continuation semantics on a planted
corpus and the newsvendor optimality property."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface25 as s25
from sap_cta_data_pipeline_spark.operators.surface25 import (
    part_newsvendor_stock,
    text_lm_kneser_ney_bigram,
)


def test_kn_continuation_beats_raw_frequency(spark):
    # "francisco" only ever follows "san" (frequent but one context);
    # "day" follows many different words (same total count).
    docs = []
    for i in range(6):
        docs.append((i, "en", "san francisco san francisco san francisco"))
    docs.append((6, "en", "good day nice day bad day rainy day sunny day cold day warm day happy day every day each day"))
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    orig = s25.t
    try:
        s25.t = lambda spark_, sf_, name: df  # noqa: ARG005
        rows = text_lm_kneser_ney_bigram.__wrapped__(spark, "x").collect()
    finally:
        s25.t = orig
    by = {(r.w1, r.w2): r for r in rows}
    # unigram frequency of 'francisco' (18) > 'day' (11), but KN backoff
    # mass favors 'day' (11 contexts vs 1): check continuation ordering
    # via the p_kn of an unseen-context proxy — the backoff share inside
    # p_kn('san','francisco') uses n1p_back=1 while any (x,'day') uses
    # n1p_back=11.
    sf = by[("san", "francisco")]
    assert sf.c12 == 18
    # replay the formula in python from the planted corpus:
    # types = {san->francisco, francisco->san} ∪ the day doc's 19
    # bigrams (10 (x,day) + 9 (day,x) distinct) = 21
    n_types = 21.0
    p = max(18 - 0.75, 0) / 18 + 0.75 * (1 / 18) * (1 / n_types)
    assert math.isclose(sf.p_kn, round(p, 6), abs_tol=2e-6)


def test_kn_probabilities_bounded(spark, sf_dir):
    rows = text_lm_kneser_ney_bigram.__wrapped__(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0 + 1e-9
        assert r.c12 >= 3


def test_newsvendor_quantile_optimality(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t
    from sap_cta_data_pipeline_spark.operators.surface25 import _CO, _CU

    out = {r.brand: r for r in part_newsvendor_stock.__wrapped__(spark, sf_dir).collect()}
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    demand = (
        li.join(p.select("p_partkey", "p_brand"), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("day"))
        .agg(F.sum("l_quantity").alias("d"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in demand:
        series.setdefault(r.brand, []).append(float(r.d))
    for brand, ds in series.items():
        ds.sort()
        row = out[brand]
        assert row.n_days == len(ds)
        assert row.q_star in ds, "percentile_disc returns a member"

        def cost(q):
            return sum(
                _CO * max(q - d, 0) + _CU * max(d - q, 0) for d in ds
            )

        # q* is no worse than the adjacent order statistics
        i = ds.index(row.q_star)
        for j in (i - 1, i + 1):
            if 0 <= j < len(ds):
                assert cost(row.q_star) <= cost(ds[j]) + 1e-6
        # accounting identity
        assert math.isclose(
            row.exp_leftover,
            round(sum(max(row.q_star - d, 0) for d in ds) / len(ds), 6),
            abs_tol=2e-6,
        )
