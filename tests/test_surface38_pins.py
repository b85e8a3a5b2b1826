"""Batch ER pins — BLEU clipping/identity/brevity semantics on planted
pairs."""

from __future__ import annotations

import math

import sap_cta_data_pipeline_spark.operators.surface38 as s38
from sap_cta_data_pipeline_spark.operators.surface38 import (
    text_bleu2_corpus_eval,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    orig = s38.t
    try:
        s38.t = lambda spark_, sf_, name: df  # noqa: ARG005
        (r,) = text_bleu2_corpus_eval.__wrapped__(spark, "x").collect()
    finally:
        s38.t = orig
    return r


def test_bleu_identity_when_nothing_dropped(spark):
    # 6-token docs: every index 1..6, only i=7 would drop -> cand == ref
    r = _run(spark, ["a b c d e f", "g h i j k l"])
    assert r.p1 == 1.0 and r.p2 == 1.0 and r.bp == 1.0
    assert r.bleu2 == 1.0


def test_bleu_brevity_and_precision_with_drops(spark):
    # 14 tokens: tokens at positions 7 and 14 drop -> cand 12 tokens
    text = " ".join(f"w{i}" for i in range(14))
    r = _run(spark, [text])
    # all 14 tokens distinct: every kept unigram matches -> p1 = 1
    assert r.p1 == 1.0
    # drops hit positions 7 (w6, interior -> ONE spliced bigram w5 w7)
    # and 14 (w13, the last token -> pure truncation, no splice):
    # cand has 11 bigrams, 10 of which exist in ref
    assert math.isclose(r.p2, 10 / 11, abs_tol=1e-6)
    assert math.isclose(r.bp, math.exp(1 - 14 / 12), abs_tol=1e-6)
    want = r.bp * math.exp(0.5 * (math.log(1.0) + math.log(10 / 11)))
    assert math.isclose(r.bleu2, round(want, 6), abs_tol=2e-6)


def test_corpus_lane_bounds(spark, sf_dir):
    (r,) = text_bleu2_corpus_eval.__wrapped__(spark, sf_dir).collect()
    assert 0.0 < r.p2 <= r.p1 <= 1.0
    assert 0.0 < r.bp <= 1.0
    assert 0.0 < r.bleu2 <= 1.0
    assert r.bleu2 <= r.p1
