"""Batch EK pins — TextRank semantics on a planted document and Flesch
formula replay."""

from __future__ import annotations

import math

import sap_cta_data_pipeline_spark.operators.surface31 as s31
from sap_cta_data_pipeline_spark.operators.surface31 import (
    text_readability_flesch,
    text_textrank_sentences,
)


def test_textrank_hub_sentence_wins(spark):
    # sentence 2 shares tokens with 1 AND 3; 1 and 3 share nothing
    # with each other -> sentence 2 is the connector and must rank top.
    doc = (
        "alpha beta gamma. "
        "beta gamma delta epsilon. "
        "delta epsilon zeta."
    )
    df = spark.createDataFrame(
        [(0, "en", doc), (1, "en", "solo words here. nothing shared now.")],
        "doc_id long, lang string, text string",
    )
    orig = s31.t
    try:
        s31.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = {
            r.doc_id: r
            for r in text_textrank_sentences.__wrapped__(spark, "x").collect()
        }
    finally:
        s31.t = orig
    assert got[0].top_sentence_idx == 2
    assert got[0].n_sentences == 3
    assert got[0].score > 1.0  # the hub accumulates rank above init
    # doc 1: no shared tokens -> all isolated at base score 0.15,
    # tiebreak picks sentence 1
    assert got[1].top_sentence_idx == 1
    assert math.isclose(got[1].score, 0.15, abs_tol=1e-6)


def test_flesch_formula_replay(spark):
    # "the cat sat. it ran away." -> known counts
    df = spark.createDataFrame(
        [(0, "en", "the cat sat. it ran away.")],
        "doc_id long, lang string, text string",
    )
    orig = s31.t
    try:
        s31.t = lambda spark_, sf_, name: df  # noqa: ARG005
        (r,) = text_readability_flesch.__wrapped__(spark, "x").collect()
    finally:
        s31.t = orig
    # words: the cat sat. it ran away. -> 6 tokens (punct attached);
    # syllables (vowel groups, min 1): the=1 cat=1 sat.=1 it=1 ran=1
    # away.=2 -> 7; sentences = 2
    assert r.n_words == 6 and r.n_sentences == 2 and r.n_syllables == 7
    wps, spw = 6 / 2, 7 / 6
    assert math.isclose(
        r.flesch_ease, round(206.835 - 1.015 * wps - 84.6 * spw, 6), abs_tol=1e-6
    )
    assert math.isclose(
        r.fk_grade, round(0.39 * wps + 11.8 * spw - 15.59, 6), abs_tol=1e-6
    )


def test_flesch_corpus_sanity(spark, sf_dir):
    rows = text_readability_flesch.__wrapped__(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_syllables >= r.n_words  # >= one syllable per word
        assert r.n_sentences >= 1
