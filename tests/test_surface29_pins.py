"""Batch EI pins — planted contamination and χ² histogram-distance
identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface29 as s29
from sap_cta_data_pipeline_spark.operators.surface29 import (
    multimodal_pgm_hist_similarity,
    text_contamination_jaccard,
)


def test_contamination_planted(spark):
    bench_text = " ".join(f"b{i}" for i in range(20))
    leak = bench_text + " " + " ".join(f"x{i}" for i in range(4))
    clean = " ".join(f"c{i}" for i in range(24))
    near_miss = " ".join(f"b{i}" for i in range(8)) + " " + " ".join(
        f"y{i}" for i in range(16)
    )
    df = spark.createDataFrame(
        [
            (0, "en", bench_text),     # doc_id % 97 == 0 -> benchmark
            (1, "en", leak),           # copies the whole benchmark
            (2, "en", clean),          # no overlap
            (3, "en", near_miss),      # small overlap, below threshold
        ],
        "doc_id long, lang string, text string",
    )
    orig = s29.t
    try:
        s29.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = {
            r.doc_id: r
            for r in text_contamination_jaccard.__wrapped__(spark, "x").collect()
        }
    finally:
        s29.t = orig
    assert got[1].contaminated and got[1].worst_bench == 0
    # leak: 20 shared grams, |leak|=20, |bench|=16 -> 16/(20+16-16)=0.8
    assert math.isclose(got[1].jaccard, 0.8, abs_tol=1e-6)
    assert 2 not in got, "no shared gram -> never paired"
    assert 3 in got and not got[3].contaminated
    # near_miss: grams fully inside b0..b7 = 4 shared; sizes 20,16
    assert math.isclose(got[3].jaccard, 4 / 32, abs_tol=1e-6)


def test_hist_similarity_invariants(spark, sf_dir):
    rows = multimodal_pgm_hist_similarity.__wrapped__(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in by_probe.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.chi2 <= b.chi2 + 1e-9
        assert all(r.chi2 >= 0 and r.cand_id != probe for r in rs)


def test_chi2_zero_for_identical_histograms(spark):
    # two identical embeddings -> identical pixels -> chi2 == 0
    e = [0.1 * ((i % 16) - 8) for i in range(64)]
    df = spark.createDataFrame(
        [(0, 1, e), (1, 1, e), (2, 1, [0.9] * 64)],
        "vec_id long, label int, embedding array<float>",
    )
    orig = s29.t
    try:
        s29.t = lambda spark_, sf_, name: df  # noqa: ARG005
        rows = multimodal_pgm_hist_similarity.__wrapped__(spark, "x").collect()
    finally:
        s29.t = orig
    got = {(r.probe_id, r.cand_id): r.chi2 for r in rows}
    assert got[(0, 1)] == 0.0 and got[(1, 0)] == 0.0
    assert got[(0, 2)] > 0
