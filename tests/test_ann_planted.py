"""Round-5 verdict ask #2: planted-neighbor ANN recall pins.

The organic sim_recall_eval numbers on the uniform synthetic corpus are
bounded by corpus geometry (recall@5 0.06/0.28/0.38 at sf0.01 — there is
no neighborhood structure to find), which licenses nothing about the
index. These tests plant the structure: 5 true near-copies per probe at
cos ≈ 1−1e-7 (similarity.planted_embeddings_dir), then REQUIRE the
multi-probe LSH and IVF lanes to recover them (recall@5 ≥ 0.8 pinned).
A lane that misses a 1−1e-7 copy is mistuned — that is now a test
failure, not a docstring shrug.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.similarity import (
    _PLANTED_ID_BASE,
    _PLANTED_PER_PROBE,
    planted_embeddings_dir,
)
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def pdir(spark, sf_dir):
    return planted_embeddings_dir(spark, sf_dir)


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    return lambda key: QUERIES[key](spark, sf_dir)


def test_planted_corpus_shape(spark, sf_dir, pdir):
    """Fixture sanity: organic corpus + 5 planted copies per probe, ids
    disjoint from the organic range, unit-ish norms preserved."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    organic = load_table(spark, sf_dir, "embeddings")
    planted = load_table(spark, pdir, "embeddings")
    n_probes = organic.filter(F.col("vec_id") < 10).count()
    assert planted.count() == organic.count() + n_probes * _PLANTED_PER_PROBE
    extra = planted.filter(F.col("vec_id") >= _PLANTED_ID_BASE)
    assert extra.count() == n_probes * _PLANTED_PER_PROBE
    # every planted id decodes back to its probe
    decoded = extra.select(
        ((F.col("vec_id") - _PLANTED_ID_BASE) / 100).cast("long").alias("probe")
    )
    assert decoded.filter((F.col("probe") < 0) | (F.col("probe") >= 10)).count() == 0


def test_exact_top5_is_the_planted_set(spark, pdir):
    """Ground-truth sanity: on the planted corpus the brute-force top-5 of
    every probe is exactly its 5 planted copies — the perturbation is so
    small no organic vector can outrank a copy."""
    exact = QUERIES["sim_knn_cosine"](spark, pdir)
    rows = exact.collect()
    by_probe: dict[int, set[int]] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, set()).add(r.cand_id)
    assert set(by_probe) == set(range(10))
    for probe, cands in by_probe.items():
        expected = {
            _PLANTED_ID_BASE + probe * 100 + j
            for j in range(1, _PLANTED_PER_PROBE + 1)
        }
        assert cands == expected, f"probe {probe}: {sorted(cands)}"


def _planted_recall(spark, pdir, ann_key: str) -> dict[int, float]:
    exact = QUERIES["sim_knn_cosine"](spark, pdir).select("probe_id", "cand_id")
    ann = QUERIES[ann_key](spark, pdir).select("probe_id", "cand_id")
    hits = (
        exact.join(ann, ["probe_id", "cand_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    got = {r.probe_id: r.h / 5.0 for r in hits.collect()}
    return {p: got.get(p, 0.0) for p in range(10)}


def test_multiprobe_planted_recall_pinned(spark, pdir):
    rec = _planted_recall(spark, pdir, "sim_ann_lsh_multiprobe")
    mean = sum(rec.values()) / len(rec)
    assert mean >= 0.8, f"multi-probe planted recall {mean:.2f} < 0.8: {rec}"


def test_ivf_planted_recall_pinned(spark, pdir):
    rec = _planted_recall(spark, pdir, "sim_ann_ivf")
    mean = sum(rec.values()) / len(rec)
    assert mean >= 0.8, f"IVF planted recall {mean:.2f} < 0.8: {rec}"


def test_ivf_kmeans_planted_recall_pinned(spark, pdir):
    """The learned-cell IVF (k-means coarse quantizer) must also recover
    planted near-copies — cells trained on the planted corpus put each
    probe and its copies in the same cell, and nprobe=2 covers boundary
    splits."""
    rec = _planted_recall(spark, pdir, "emb_ivf_kmeans_ann")
    mean = sum(rec.values()) / len(rec)
    assert mean >= 0.8, f"kmeans-IVF planted recall {mean:.2f} < 0.8: {rec}"


def test_recall_eval_reports_planted_columns(q):
    """sim_recall_eval carries organic AND planted recall side by side;
    planted multi-probe/IVF columns must clear the same 0.8 bar."""
    rows = q("sim_recall_eval").collect()
    assert len(rows) == 10
    pm = sum(r.recall_planted_multiprobe for r in rows) / len(rows)
    pi = sum(r.recall_planted_ivf for r in rows) / len(rows)
    pq = sum(r.recall_planted_ivfpq for r in rows) / len(rows)
    assert pm >= 0.8
    assert pi >= 0.8
    assert pq >= 0.8
    for r in rows:
        assert 0.0 <= r.recall_planted <= 1.0


def test_ivfpq_planted_recall_pinned(spark, pdir):
    """IVF-PQ (ADC scoring over 8-byte codes) must still recover planted
    1−1e-7 copies: quantization distortion moves distances but cannot
    reorder a near-identical copy behind organic vectors at this margin."""
    rec = _planted_recall(spark, pdir, "sim_ann_ivfpq")
    mean = sum(rec.values()) / len(rec)
    assert mean >= 0.8, f"IVF-PQ planted recall {mean:.2f} < 0.8: {rec}"


def test_ivfpq_rerank_recall_at_least_pure_adc(spark, pdir):
    """Exact re-ranking of the ADC shortlist can only help: planted
    recall ≥ the pure-ADC lane, and ≥ 0.9 (a 1−1e-7 copy that survives
    the 4× shortlist is unmissable under exact scoring)."""
    adc = _planted_recall(spark, pdir, "sim_ann_ivfpq")
    rr = _planted_recall(spark, pdir, "sim_ann_ivfpq_rerank")
    m_adc = sum(adc.values()) / len(adc)
    m_rr = sum(rr.values()) / len(rr)
    assert m_rr >= m_adc - 1e-9, (m_rr, m_adc)
    assert m_rr >= 0.9, rr
