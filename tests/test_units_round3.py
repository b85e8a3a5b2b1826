"""Round-3 batch-W unit pins that the driver's rows-only lane can't see."""

from __future__ import annotations

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_countmin_estimate_upper_bounds_exact(spark, sf_dir):
    rows = QUERIES["agg_countmin_mergeable"](spark, sf_dir).collect()
    assert len(rows) == 10
    # count-min property: the min-over-depths estimate NEVER undercounts
    assert all(r["est_ge_exact"] for r in rows)
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    # with width 256 vs the fixture's small user domain, most probes
    # should be collision-free (exact); require at least half
    exact_hits = sum(1 for r in rows if r["cms_est"] == r["exact_n"])
    assert exact_hits >= 5


def test_random_projection_is_shuffle_free(spark, sf_dir):
    from sap_cta_data_pipeline_spark.plans import digest

    d = digest(QUERIES["emb_random_projection"](spark, sf_dir))
    assert d.shuffle_free, "JL projection must plan as a pure projection"


def test_minhash_group_jaccard_calibration(spark, tmp_path_factory):
    """The sf fixture's languages have disjoint vocabularies (J=0 pairs,
    where est=0 trivially) — this fixture plants two languages sharing
    half their vocabulary (J = 1/3) to exercise the estimator, and two
    sources per language to exercise the shard merge."""
    shared = [f"common{i}" for i in range(40)]
    only_a = [f"aa{i}" for i in range(40)]
    only_b = [f"bb{i}" for i in range(40)]
    rows = []
    did = 0
    for src in ("s1", "s2"):
        for words, lang in [
            (shared[:20] + only_a[:20], "aa"), (shared[20:] + only_a[20:], "aa"),
            (shared[:20] + only_b[:20], "bb"), (shared[20:] + only_b[20:], "bb"),
        ]:
            did += 1
            rows.append((did, " ".join(words), lang, src, len(" ".join(words))))
    d = tmp_path_factory.mktemp("mh_group_fixture")
    spark.createDataFrame(
        rows, schema="doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    out = QUERIES["agg_minhash_group_jaccard"](spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["merge_exact"] is True
    assert r["exact_jaccard"] == pytest.approx(40 / 120, abs=1e-6)
    # 64 permutations: σ ≈ sqrt(J(1−J)/64) ≈ 0.059; 4σ bound
    assert abs(r["est_jaccard"] - r["exact_jaccard"]) < 0.24
