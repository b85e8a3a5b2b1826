"""Unit tests for the round-2h training-data-prep lane: PII redaction,
benchmark contamination, Gopher repetition gates, exact corpus mixing,
z-order layout, inverted postings, linear interpolation, power-iteration
PCA."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_pii_redact_masks_everything(q, spark, sf_dir):
    rows = q("text_pii_redact").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert "@" not in r.redacted, r.redacted
        assert "<EMAIL>" in r.redacted
        assert r.n_email >= 1
        # the planted ref number doc_id*7919 has >=4 digits for doc_id >= 1
        if r.doc_id >= 1:
            assert r.n_longnum >= 1 and "<NUM>" in r.redacted


def test_contamination_excludes_eval_and_is_bounded(q):
    rows = q("text_contamination_ngram").collect()
    assert rows, "dup-heavy corpus must surface contamination"
    for r in rows:
        assert r.doc_id % 23 != 0  # eval docs never flagged against themselves
        assert 1 <= r.n_contam <= r.n_ngrams
        assert 0 < r.contam_frac <= 1.0


def test_repetition_fracs_and_flag_consistent(q):
    rows = q("text_repetition_gopher").collect()
    assert rows
    flagged = 0
    for r in rows:
        assert 0 < r.distinct_frac <= 1.0
        assert 0 < r.top_token_frac <= 1.0
        assert r.top_token_frac <= r.distinct_frac * r.n_tok  # trivially sane
        expect = r.distinct_frac < 0.4 or r.top_token_frac > 0.12
        # rounded fracs can flip the comparison only within 5e-7 of the
        # threshold; accept either verdict inside that band
        near = (
            abs(r.distinct_frac - 0.4) < 1e-6 or abs(r.top_token_frac - 0.12) < 1e-6
        )
        assert r.flag_repetitive == expect or near
        flagged += bool(r.flag_repetitive)
    assert 0 < flagged < len(rows), "thresholds must split the corpus"


def test_corpus_mix_exact_rates(q):
    rows = q("corpus_mix_exact").collect()
    assert len(rows) >= 2
    n_min = min(r.n_before for r in rows)
    for r in rows:
        assert 0 < r.n_kept <= r.n_before
        assert abs(r.target_rate - round(n_min / r.n_before, 6)) < 1e-9
        # exact integer downsampling: kept count concentrates near target
        assert r.n_kept <= r.n_before
    smallest = [r for r in rows if r.n_before == n_min]
    # the smallest stratum keeps everything (hash mod n < n is always true)
    assert all(r.n_kept == r.n_before for r in smallest)


def test_zorder_buckets_bound_both_dims(q):
    rows = q("layout_zorder_cluster").collect()
    assert rows
    total = sum(r.n_rows for r in rows)
    assert total > 0
    for r in rows:
        # each z-bucket's envelope must be a sub-range of both dimensions,
        # strictly narrower than the full [0,256) domain
        assert 0 <= r.min_part <= r.max_part <= 255
        assert 0 <= r.min_supp <= r.max_supp <= 255
        assert (r.max_part - r.min_part) <= 127
        assert (r.max_supp - r.min_supp) <= 127


def test_inverted_postings_consistency(q, spark, sf_dir):
    rows = q("index_inverted_postings").collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    total_tf = sum(r.tf_total for r in rows)
    n_tokens = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
    ).collect()[0][0]
    assert total_tf == n_tokens  # index covers every token occurrence
    for r in rows:
        assert 1 <= r.df <= n_docs
        assert r.tf_total >= r.df
        assert list(r.posting_sample) == sorted(r.posting_sample)
        assert len(r.posting_sample) == min(r.df, 5)


def test_interpolation_between_known_points(q, spark, sf_dir):
    out = q("ts_interpolate_linear")
    rows = out.collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 50 == 0)
        .select("user_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append((e.ts, e.value))
    for u in by_user:
        by_user[u].sort()
    checked = 0
    for r in rows[:400]:
        pts = by_user[r.user_id]
        prev = [p for p in pts if p[0] <= r.t]
        nxt = [p for p in pts if p[0] > r.t]
        if prev and nxt:
            (pt, pv), (nt, nv) = prev[-1], nxt[0]
            frac = (r.t - pt).total_seconds() / (nt - pt).total_seconds()
            expect = pv + (nv - pv) * frac
            assert r.value_interp == pytest.approx(expect, abs=1e-4)
            # interpolated value lies inside the bracketing segment
            assert min(pv, nv) - 1e-9 <= r.value_interp <= max(pv, nv) + 1e-9
            checked += 1
        elif prev:
            assert r.value_interp == pytest.approx(prev[-1][1], abs=1e-6)
    assert checked > 10


def test_pca_power_matches_numpy(q, spark, sf_dir):
    np = pytest.importorskip("numpy")
    rows = sorted(q("emb_pca_power").collect(), key=lambda r: r.dim)
    v = np.array([r.loading for r in rows])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    emb = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    gram = x.T @ x
    w, vecs = np.linalg.eigh(gram)
    top = vecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    # power iteration converges to the dominant eigenvector
    assert float(np.abs(top @ v)) > 0.999
    assert rows[0].eigval == pytest.approx(w[-1] / x.shape[0], rel=1e-3)
    assert rows[0].n_vectors == x.shape[0]


def test_new_keys_registered_with_oracles():
    from sap_cta_data_pipeline_spark.registry import ORACLES

    keys = [
        "text_pii_redact",
        "text_contamination_ngram",
        "text_repetition_gopher",
        "corpus_mix_exact",
        "layout_zorder_cluster",
        "index_inverted_postings",
        "ts_interpolate_linear",
        "emb_pca_power",
    ]
    for k in keys:
        assert k in QUERIES
    for k in keys:
        assert k in ORACLES
    # emb_pca_power was rows-only when this batch landed (round 2);
    # round 6 upgraded it to a full unrolled-CTE value oracle
