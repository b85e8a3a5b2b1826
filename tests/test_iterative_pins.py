"""Value pins for the two iterative rows-only lanes (VERDICT r02 ask #7).

The driver checks these lanes rows-only (no ANSI-SQL twin exists), so
these tests pin their VALUES against independently hand-computed
fixtures: PageRank against a numpy replication of the 10-iteration
damped fixpoint on a 5-node graph planted through the co-purchase
derivation, and the power-iteration PCA against the analytic principal
axis of a crafted 2-component cloud whose cross-moments vanish.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def graph_dir(spark, tmp_path_factory):
    """lineitem fixture whose co-purchase derivation (distinct (order,
    part) → popularity ≥ 3 → pair count ≥ 2) yields EXACTLY the 5-node
    graph 1-2, 2-3, 3-4, 4-5, 1-3: each edge planted as two orders
    containing exactly that part pair; degree-1 node 5 gets a singleton
    booster order so it clears the popularity filter without new pairs."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
    rows = []
    okey = 0
    for u, v in edges:
        for _ in range(2):
            okey += 1
            rows.append((okey, u))
            rows.append((okey, v))
    okey += 1
    rows.append((okey, 5))
    d = tmp_path_factory.mktemp("pagerank_fixture")
    spark.createDataFrame(
        rows, schema="l_orderkey bigint, l_partkey bigint"
    ).write.parquet(str(d / "lineitem.parquet"))
    return str(d), edges


def _expected_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    directed = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    outdeg = np.zeros(n)
    for u, _ in directed:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in directed:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        r = (1 - d) / n + d * contrib
    return {node: r[idx[node]] * n for node in nodes}


def test_pagerank_matches_hand_computed_fixpoint(spark, graph_dir):
    sf_dir, edges = graph_dir
    got = {
        row["node"]: row["rank_scaled"]
        for row in QUERIES["graph_pagerank"](spark, sf_dir).collect()
    }
    want = _expected_pagerank(edges)
    assert set(got) == set(want)
    for node, val in want.items():
        assert got[node] == pytest.approx(val, abs=2e-6), node
    # sanity: mass conserved (scaled ranks average to ~1)
    assert np.mean(list(got.values())) == pytest.approx(1.0, abs=1e-4)


@pytest.fixture(scope="module")
def pca_dir(spark, tmp_path_factory):
    """Embeddings fixture: x_i = s_i·u + t_i·w with Σsᵢtᵢ = 0, so the
    uncentered Gram is exactly (Σs²)uuᵀ + (Σt²)wwᵀ — principal axis u,
    eigval Σs²/n, no approximation in the expectation itself."""
    u = np.zeros(64)
    u[1], u[2] = 0.6, 0.8
    w = np.zeros(64)
    w[1], w[2] = -0.8, 0.6
    s = [4.0, 4.0, -4.0, -4.0]
    t = [1.0, -1.0, 1.0, -1.0]
    vecs = [(si * u + ti * w) for si, ti in zip(s, t)]
    d = tmp_path_factory.mktemp("pca_fixture")
    rows = [
        (i, [float(x) for x in vec], 0) for i, vec in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pca_power_matches_analytic_axis(spark, pca_dir):
    out = {
        row["dim"]: row
        for row in QUERIES["emb_pca_power"](spark, pca_dir).collect()
    }
    assert len(out) == 64
    # principal axis is u = 0.6·e1 + 0.8·e2, sign fixed positive at the
    # largest-|loading| dim (dim 2, +0.8)
    assert out[1]["loading"] == pytest.approx(0.6, abs=1e-5)
    assert out[2]["loading"] == pytest.approx(0.8, abs=1e-5)
    off_axis = [abs(out[i]["loading"]) for i in range(64) if i not in (1, 2)]
    assert max(off_axis) < 1e-5
    # eigval = Σs²/n = 64/4
    assert out[0]["eigval"] == pytest.approx(16.0, abs=1e-4)
    assert out[0]["n_vectors"] == 4


@pytest.fixture(scope="module")
def kmeans_dir(spark, tmp_path_factory):
    """Two tight planted clusters far apart; k=8 with smallest-vec_id
    init, so 2 cells capture the clusters and 6 cells keep their init
    centroids (empty cells retain the previous centroid by design)."""
    rows = []
    # cluster A near 10*e0 (vec_ids 0..19), cluster B near 10*e1 (20..39)
    for i in range(20):
        v = np.zeros(64)
        v[0] = 10.0 + (i % 5) * 0.01
        rows.append((i, [float(x) for x in v], 0))
    for i in range(20, 40):
        v = np.zeros(64)
        v[1] = 10.0 + (i % 5) * 0.01
        rows.append((i, [float(x) for x in v], 1))
    d = tmp_path_factory.mktemp("kmeans_fixture")
    spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_recovers_planted_clusters(spark, kmeans_dir):
    out = QUERIES["emb_kmeans_lloyd"](spark, kmeans_dir).collect()
    # every vector assigned somewhere, total preserved
    assert sum(r["n_vectors"] for r in out) == 40
    # the two planted clusters are tight: whatever cells they land in,
    # within-cell mean squared distance must be tiny (< 0.01), i.e. no
    # cell mixes the two clusters (mixing would cost ~100)
    assert all(r["mean_sq_dist"] < 0.01 for r in out)


@pytest.fixture(scope="module")
def kcore_dir(spark, tmp_path_factory):
    """lineitem fixture planting K4 on {1,2,3,4} (the 2-core) plus a
    tendril 4-5, 5-6: node 6 (degree 1) peels in round one, which drops
    node 5 to degree 1 so it peels next — the fixture exercises
    multi-round cascading peeling, not just a one-shot degree filter. Node 6 gets a singleton booster
    order to clear the popularity >= 3 filter."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    rows = []
    okey = 0
    for u, v in edges:
        for _ in range(2):
            okey += 1
            rows.append((okey, u))
            rows.append((okey, v))
    okey += 1
    rows.append((okey, 6))
    d = tmp_path_factory.mktemp("kcore_fixture")
    spark.createDataFrame(
        rows, schema="l_orderkey bigint, l_partkey bigint"
    ).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_k_core_planted_fixpoint(spark, kcore_dir):
    """graph_k_core (k=2) on the planted graph returns exactly the K4
    nodes, each with within-core degree 3 (tendril fully cascaded away)."""
    out = {
        r["node"]: r["core_degree"]
        for r in QUERIES["graph_k_core"](spark, kcore_dir).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


@pytest.fixture(scope="module")
def pq_dir(spark, tmp_path_factory):
    """embeddings fixture with exactly 2 distinct subvector patterns per
    subspace (vector parity selects pattern A or B in every subspace):
    the first 16 vectors used for codebook init contain both patterns,
    so PQ must encode the corpus LOSSLESSLY — mean_sq_err pins to 0.0
    and exactly 2 codes stay live per subspace."""
    rows = []
    for vid in range(32):
        base = 1.0 if vid % 2 == 0 else -1.0
        emb = []
        for m in range(8):
            emb.extend([base * (m + 1.0 + d * 0.125) for d in range(8)])
        rows.append((vid, [float(x) for x in emb], vid % 2))
    d = tmp_path_factory.mktemp("pq_fixture")
    spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pq_quantize_lossless_on_planted_patterns(spark, pq_dir):
    out = QUERIES["emb_pq_quantize"](spark, pq_dir).collect()
    assert len(out) == 8
    for r in out:
        assert r["n_subvectors"] == 32
        assert r["mean_sq_err"] == 0.0
        assert r["n_codes_used"] == 2


@pytest.fixture(scope="module")
def minhash_inc_dir(spark, tmp_path_factory):
    """documents fixture for the incremental near-dup lane: even doc 0 is
    the corpus; odd doc 1 differs from it by 1 of 40 tokens (J = 39/41
    ≈ 0.95 — must flag), odd doc 3 shares nothing (must not flag)."""
    toks = [f"tok{i:02d}" for i in range(40)]
    near = toks[:-1] + ["changed"]
    other = [f"zzz{i:02d}" for i in range(40)]
    rows = [
        (0, " ".join(toks), "en", "s", len(" ".join(toks))),
        (1, " ".join(near), "en", "s", len(" ".join(near))),
        (3, " ".join(other), "en", "s", len(" ".join(other))),
    ]
    d = tmp_path_factory.mktemp("minhash_inc_fixture")
    spark.createDataFrame(
        rows, schema="doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_incremental_planted_verdicts(spark, minhash_inc_dir):
    out = {
        r["batch_id"]: r
        for r in QUERIES["dedup_minhash_incremental"](spark, minhash_inc_dir).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["is_near_dup"] and out[1]["best_match"] == 0
    assert out[1]["est_jaccard"] >= 0.75
    assert not out[3]["is_near_dup"] and out[3]["best_match"] is None


def test_quantile_accuracy_within_gk_bound(spark):
    """quantile_accuracy_eval: every approx estimate must be an actual
    corpus value within the GK rank-error bound — for accuracy parameter
    a, the rank error is ≤ n/a, so with a = 10000 on 60k rows the
    estimate's rank must be within ~6 of the exact percentile's rank;
    assert the VALUE error at the tightest budget is tiny relative to
    the p50-p99 spread (the operational meaning of 'safe to swap')."""
    rows = {
        (r["quantile"], r["accuracy_param"]): r
        for r in QUERIES["quantile_accuracy_eval"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) == 9
    spread = abs(rows[(0.99, 10000)]["exact_value"] - rows[(0.5, 10000)]["exact_value"])
    for q in (0.5, 0.9, 0.99):
        assert rows[(q, 10000)]["abs_err"] <= 0.01 * spread
        # monotone budgets: tighter accuracy never does worse by 10x
        assert rows[(q, 10000)]["abs_err"] <= rows[(q, 100)]["abs_err"] * 10 + 1e-9


@pytest.fixture(scope="module")
def bpe_dir(spark, tmp_path_factory):
    """documents fixture whose word-frequency table is
    {banana: 2, bandana: 1} — small enough to hand-run the BPE loop."""
    d = tmp_path_factory.mktemp("bpe_fixture")
    spark.createDataFrame(
        [(1, "banana banana bandana", "xx")],
        schema="doc_id bigint, text string, lang string",
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_learn_pinned_merge_sequence(spark, bpe_dir):
    """Hand-computed merge table for {banana×2, bandana×1}:

    r1 pairs: (a,n)=6 (2+2 per banana ×2 words... see counts below),
       (n,a)=5, (b,a)=3, (n,d)=1, (d,a)=1 → merge (a,n)→an, 6.
       banana→[b,an,an,a], bandana→[b,an,d,an,a]; symbols {a,an,b,d}=4.
    r2 pairs: (b,an)=3, (an,a)=3, (an,an)=2, (an,d)=1, (d,an)=1 —
       tie at 3 broken by left asc: "an" < "b" → merge (an,a)→ana, 3.
       banana→[b,an,ana], bandana→[b,an,d,ana]; symbols {an,ana,b,d}=4.
    r3 pairs: (b,an)=3, (an,ana)=2, (an,d)=1, (d,ana)=1 →
       merge (b,an)→ban, 3. banana→[ban,ana], bandana→[ban,d,ana];
       symbols {ana,ban,d}=3."""
    rows = sorted(
        QUERIES["text_bpe_learn"](spark, bpe_dir).collect(), key=lambda r: r.round
    )
    got = [
        (r.round, r.left, r.right, r.merged, r.n_pairs, r.vocab_size_after)
        for r in rows[:3]
    ]
    assert got == [
        (1, "a", "n", "an", 6, 4),
        (2, "an", "a", "ana", 3, 4),
        (3, "b", "an", "ban", 3, 3),
    ]


def test_bpe_apply_pinned_encoding(spark, bpe_dir):
    """On the fixture the merge loop converges before 8 rounds (banana and
    bandana each collapse to a single symbol by round 6), so BPE encoding
    yields exactly one token per word: 3 words -> 3 tokens, 19 chars."""
    rows = QUERIES["text_bpe_apply"](spark, bpe_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.lang == "xx"
    assert r.n_words == 3
    assert r.n_chars == 19
    assert r.n_tokens_bpe == 3
    assert r.chars_per_token == pytest.approx(19 / 3, abs=1e-6)
