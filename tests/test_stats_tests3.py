"""Batch EV pins — planted closed-form values for Brown–Forsythe,
Cohen's d / Hedges' g, Jarque–Bera, and Cramér's V (the oracle certifies
engine parity; these certify the STATISTICS against hand arithmetic)."""

from __future__ import annotations

import math

import sap_cta_data_pipeline_spark.operators.stats_tests3 as m3
from sap_cta_data_pipeline_spark.operators.stats_tests3 import (
    stats_cohens_d,
    stats_cramers_v,
    stats_jarque_bera,
    stats_levene_brown_forsythe,
)


def _plant(monkeypatch, df_of):
    monkeypatch.setattr(m3, "t", lambda spark, sf, name: df_of(name))


def test_levene_planted(spark, monkeypatch):
    # g1 = [0, 10, 20] (z = 10,0,10), g2 = [0, 2, 4] (z = 2,0,2)
    rows = [("g1", 0.0), ("g1", 10.0), ("g1", 20.0),
            ("g2", 0.0), ("g2", 2.0), ("g2", 4.0)]
    _plant(
        monkeypatch,
        lambda name: spark.createDataFrame(
            rows, "o_orderpriority string, o_totalprice double"
        ),
    )
    r = stats_levene_brown_forsythe.__wrapped__(spark, "x").collect()[0]
    assert (r.k, r.n_total) == (2, 6)
    # SSB = (400/3 + 16/3) - 24^2/6 ; SSW = (200-400/3)+(8-16/3); W = 4*SSB/SSW
    assert math.isclose(r.w_stat, 2.461538, abs_tol=1e-6)


def test_cohens_d_planted(spark, monkeypatch):
    # arm0: users 0,2 with 2,4 events; arm1: users 1,3 with 4,6 events
    events = []
    for uid, c in ((0, 2), (2, 4), (1, 4), (3, 6)):
        events += [(uid, f"e{i}") for i in range(c)]
    _plant(
        monkeypatch,
        lambda name: spark.createDataFrame(events, "user_id long, event_type string"),
    )
    r = stats_cohens_d.__wrapped__(spark, "x").collect()[0]
    assert (r.n0, r.n1, r.mean0, r.mean1) == (2, 2, 3.0, 5.0)
    assert math.isclose(r.cohens_d, 2 / math.sqrt(2), abs_tol=1e-6)
    assert math.isclose(r.hedges_g, (2 / math.sqrt(2)) * (1 - 3 / 7), abs_tol=1e-6)


def test_jarque_bera_planted(spark, monkeypatch):
    _plant(
        monkeypatch,
        lambda name: spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (4.0,)], "l_quantity double"
        ),
    )
    r = stats_jarque_bera.__wrapped__(spark, "x").collect()[0]
    assert r.n == 4 and r.skewness == 0.0
    assert math.isclose(r.kurtosis_excess, 1.64 - 3, abs_tol=1e-6)
    assert math.isclose(r.jb_stat, (4 / 6) * ((1.36**2) / 4), abs_tol=1e-6)


def test_cramers_v_planted(spark, monkeypatch):
    # dense 2x2 (a,b,c,d) = (30,10,10,30), N = 80:
    # chi2 = N(ad-bc)^2/(r1 r2 c1 c2) = 80*800^2/40^4 = 20; V = sqrt(20/80) = .5
    rows = (
        [("A", "X")] * 30 + [("A", "Y")] * 10 + [("B", "X")] * 10 + [("B", "Y")] * 30
    )
    _plant(
        monkeypatch,
        lambda name: spark.createDataFrame(
            rows, "o_orderpriority string, o_orderstatus string"
        ),
    )
    r = stats_cramers_v.__wrapped__(spark, "x").collect()[0]
    assert (r.n_rows, r.n_cols) == (2, 2)
    assert math.isclose(r.chi2, 20.0, abs_tol=1e-6)
    assert math.isclose(r.cramers_v, 0.5, abs_tol=1e-6)


# ------------------------------------------ batch EW (timeseries4) pins


def _plant_events_days(spark, monkeypatch, counts):
    """Plant an events table whose daily counts are exactly `counts`."""
    import sap_cta_data_pipeline_spark.operators.timeseries4 as t4

    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(f"2024-01-{d:02d} 00:{i:02d}:00",) for i in range(c)]
    df = spark.createDataFrame(rows, "ts_s string").selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    monkeypatch.setattr(t4, "t", lambda spark_, sf_, name: df)


def test_local_extrema_and_turning_points_planted(spark, monkeypatch):
    from sap_cta_data_pipeline_spark.operators.timeseries4 import (
        ts_local_extrema,
        ts_turning_points_test,
    )

    _plant_events_days(spark, monkeypatch, [1, 3, 2, 4, 1])
    ext = {
        r.day: r.kind for r in ts_local_extrema.__wrapped__(spark, "x").collect()
    }
    assert ext == {
        "2024-01-02": "peak",
        "2024-01-03": "trough",
        "2024-01-04": "peak",
    }
    r = ts_turning_points_test.__wrapped__(spark, "x").collect()[0]
    assert (r.n, r.n_turning, r.expected) == (5, 3, 2.0)
    assert math.isclose(r.z_score, 1.0 / math.sqrt((16 * 5 - 29) / 90), abs_tol=1e-6)


def test_ljung_box_planted_matches_reference_formula(spark, monkeypatch):
    from sap_cta_data_pipeline_spark.operators.timeseries4 import ts_ljung_box

    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    _plant_events_days(spark, monkeypatch, counts)
    got = {r.lag: (r.acf, r.q_stat) for r in ts_ljung_box.__wrapped__(spark, "x").collect()}
    n = len(counts)
    mean = sum(counts) / n
    den = sum((x - mean) ** 2 for x in counts)
    q = 0.0
    for k in range(1, 8):
        rho = sum(
            (counts[i] - mean) * (counts[i + k] - mean) for i in range(n - k)
        ) / den
        q += rho * rho / (n - k)
        assert math.isclose(got[k][0], rho, abs_tol=1e-6), k
        assert math.isclose(got[k][1], n * (n + 2) * q, abs_tol=1e-5), k


# ----------------------------------------- batch EX (training_prep4) pins


def test_mix_temperature_planted_allocation(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.training_prep4 as tp4
    from sap_cta_data_pipeline_spark.operators.training_prep4 import (
        _BUDGET,
        corpus_mix_temperature,
    )

    docs = spark.createDataFrame(
        [("A", " ".join(["w"] * 100)), ("B", " ".join(["w"] * 25))],
        "lang string, text string",
    )
    monkeypatch.setattr(tp4, "t", lambda spark_, sf_, name: docs)
    rows = {r.lang: r for r in corpus_mix_temperature.__wrapped__(spark, "x").collect()}
    assert rows["A"].n_tokens == 100 and rows["B"].n_tokens == 25
    assert rows["A"].weight == 10.0 and rows["B"].weight == 5.0
    # quotas: 66666.666667 -> 66666 (+1 largest remainder), 33333.333333 -> 33333
    assert rows["A"].quota_tokens == 66667 and rows["B"].quota_tokens == 33333
    assert rows["A"].quota_tokens + rows["B"].quota_tokens == _BUDGET


def test_mmr_matches_pure_python_reference(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.training_prep4 as tp4
    from sap_cta_data_pipeline_spark.operators.training_prep4 import (
        _K,
        _LAM,
        emb_mmr_select,
    )

    def vec(*head):
        v = [0.0] * 64
        v[: len(head)] = [float(x) for x in head]
        return v

    data = {
        0: vec(1.0),        # query (lowest vec_id)
        13: vec(1.0),       # exact dup of query direction
        26: vec(1.0, 0.001),
        39: vec(0.0, 1.0),
        52: vec(0.8, 0.6),
        65: vec(0.6, 0.8),
        78: vec(0.0, 0.0, 1.0),
    }
    emb = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(data.items())],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(tp4, "t", lambda spark_, sf_, name: emb)
    got = [
        (r.rank, r.vec_id, r.score)
        for r in sorted(
            emb_mmr_select.__wrapped__(spark, "x").collect(), key=lambda r: r.rank
        )
    ]

    # pure-python reference MMR with the same float32-ingest + r6 rounding
    import numpy as np

    def cos(a, b):
        a = np.array(a, dtype=np.float32).astype(np.float64)
        b = np.array(b, dtype=np.float32).astype(np.float64)
        return round(
            float(a @ b / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b)))), 6
        )

    q = data[0]
    pool = {k: v for k, v in data.items() if k % 13 == 0 and k != 0}
    rel = {k: cos(v, q) for k, v in pool.items()}
    sel, expect = [], []
    for rank in range(1, _K + 1):
        best = None
        for k in sorted(pool):
            if k in sel:
                continue
            if not sel:
                score = rel[k]
            else:
                score = round(
                    _LAM * rel[k]
                    - round(1 - _LAM, 6) * max(cos(pool[k], pool[s]) for s in sel),
                    6,
                )
            if best is None or score > best[1]:
                best = (k, score)
        sel.append(best[0])
        expect.append((rank, best[0], best[1]))
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in expect]
    for (_, _, gs), (_, _, es) in zip(got, expect):
        assert math.isclose(gs, es, abs_tol=2e-6)


def test_code_detect_planted(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.training_prep4 as tp4
    from sap_cta_data_pipeline_spark.operators.training_prep4 import text_code_detect

    code = "def f(x):\n    return g(x) + h[0] <= y\n    import os\n"
    prose = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(7, code), (14, prose)], "doc_id long, text string"
    )
    monkeypatch.setattr(tp4, "t", lambda spark_, sf_, name: docs)
    rows = {r.doc_id: r for r in text_code_detect.__wrapped__(spark, "x").collect()}
    assert rows[7].is_code is True
    assert rows[14].is_code is False
    assert rows[7].code_score > rows[14].code_score


# ------------------------------------------- batch FA (stats_tests4) pins


def test_pacf_matches_pure_python_durbin_levinson(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.timeseries4 as t4
    from sap_cta_data_pipeline_spark.operators.stats_tests4 import (
        ts_pacf_durbin_levinson,
    )

    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
    _plant_events_days(spark, monkeypatch, counts)
    got = {
        r.lag: r.pacf
        for r in ts_pacf_durbin_levinson.__wrapped__(spark, "x").collect()
    }
    n = len(counts)
    mean = sum(counts) / n
    den = sum((x - mean) ** 2 for x in counts)
    rho = {
        k: sum((counts[i] - mean) * (counts[i + k] - mean) for i in range(n - k))
        / den
        for k in range(1, 5)
    }
    # Durbin-Levinson reference
    phi = {(1, 1): rho[1]}
    expect = {1: rho[1]}
    for k in range(2, 5):
        num = rho[k] - sum(phi[(k - 1, j)] * rho[k - j] for j in range(1, k))
        den_k = 1 - sum(phi[(k - 1, j)] * rho[j] for j in range(1, k))
        phi[(k, k)] = num / den_k
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
        expect[k] = phi[(k, k)]
    for k in range(1, 5):
        assert math.isclose(got[k], expect[k], abs_tol=1e-6), k


def test_friedman_planted_perfect_agreement(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.stats_tests4 as s4
    from sap_cta_data_pipeline_spark.operators.stats_tests4 import stats_friedman_test

    # 3 users, 3 types, identical preference order A<B<C  ->  Q = n(k-1) = 6
    rows = []
    for u in (1, 2, 3):
        for typ, c in (("A", 1), ("B", 2), ("C", 3)):
            rows += [(u, typ)] * c
    # plus one incomplete user (missing type C) that must be EXCLUDED
    rows += [(9, "A"), (9, "B")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    monkeypatch.setattr(s4, "t", lambda spark_, sf_, name: df)
    r = stats_friedman_test.__wrapped__(spark, "x").collect()[0]
    assert (r.k, r.n_blocks) == (3, 3)
    assert math.isclose(r.q_stat, 6.0, abs_tol=1e-6)


def test_hash_digests_known_vectors(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.stats_tests4 as s4
    from sap_cta_data_pipeline_spark.operators.stats_tests4 import fn_hash_digests

    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    monkeypatch.setattr(s4, "t", lambda spark_, sf_, name: df)
    r = fn_hash_digests.__wrapped__(spark, "x").collect()[0]
    assert r.md5_hex == "900150983cd24fb0d6963f7d28e17f72"
    assert (
        r.sha256_hex
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )


# ------------------------------------------ batch FB (forecast_eval) pins


def test_proportion_ztest_planted(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.forecast_eval as fe
    from sap_cta_data_pipeline_spark.operators.forecast_eval import (
        stats_proportion_ztest,
    )

    # arm0: users 0,2,4,6 (1 converter); arm1: users 1,3,5,7 (3 converters)
    rows = []
    for uid in range(8):
        rows.append((uid, "view"))
    for uid in (0, 1, 3, 5):
        rows.append((uid, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    monkeypatch.setattr(fe, "t", lambda spark_, sf_, name: df)
    r = stats_proportion_ztest.__wrapped__(spark, "x").collect()[0]
    assert (r.n0, r.n1, r.p0, r.p1) == (4, 4, 0.25, 0.75)
    pp = 0.5
    z = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert math.isclose(r.z_score, z, abs_tol=1e-6)


def test_backtest_naive_horizon_planted(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.forecast_eval as fe
    from sap_cta_data_pipeline_spark.operators.forecast_eval import (
        ts_forecast_backtest_naive_horizon,
    )

    # linear series c = day index: naive error at horizon h is exactly h
    _plant_events_days_fe(spark, monkeypatch, fe, list(range(1, 15)))
    rows = {
        r.horizon: r
        for r in ts_forecast_backtest_naive_horizon.__wrapped__(spark, "x").collect()
    }
    for h in range(1, 8):
        assert math.isclose(rows[h].mae, float(h), abs_tol=1e-6), h
        # every day in the 28-day test window with a lag-h partner counts
        assert rows[h].n_days == 14 - h


def _plant_events_days_fe(spark, monkeypatch, mod, counts):
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(f"2024-01-{d:02d} 00:{i % 60:02d}:{i // 60:02d}",) for i in range(c)]
    df = spark.createDataFrame(rows, "ts_s string").selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    monkeypatch.setattr(mod, "t", lambda spark_, sf_, name: df)


# --------------------------------------------------- batch FC pins


def test_kruskal_wallis_planted_no_ties(spark, monkeypatch):
    import sap_cta_data_pipeline_spark.operators.stats_tests5 as s5
    from sap_cta_data_pipeline_spark.operators.stats_tests5 import (
        stats_kruskal_wallis,
    )

    # groups A={1,2}, B={3,4}, C={5,6} (cents-distinct, no ties):
    # ranks 1..6, R = (3, 7, 11); H = 12/(6*7) * (9/2+49/2+121/2) - 3*7
    rows = [
        ("A", 0.01), ("A", 0.02),
        ("B", 0.03), ("B", 0.04),
        ("C", 0.05), ("C", 0.06),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    monkeypatch.setattr(s5, "t", lambda spark_, sf_, name: df)
    r = stats_kruskal_wallis.__wrapped__(spark, "x").collect()[0]
    assert (r.k, r.n_total) == (3, 6)
    h = 12.0 / (6 * 7) * (9 / 2 + 49 / 2 + 121 / 2) - 3 * 7
    assert math.isclose(r.h_stat, h, abs_tol=1e-6)


def test_merge_cdf_feed_shape(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.delta_cdf_write import (
        delta_merge_cdf_emit,
    )
    from sap_cta_data_pipeline_spark.operators.delta_reader import delta_snapshot
    from sap_cta_data_pipeline_spark.operators.sources import _scratch

    from pyspark.sql import functions as F

    feed = delta_merge_cdf_emit.__wrapped__(spark, sf_dir)
    kinds = {
        r._change_type: r.cnt
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(kinds) == {"update_preimage", "update_postimage", "insert"}
    assert kinds["update_preimage"] == kinds["update_postimage"] > 0
    assert kinds["insert"] > 0
    # snapshot agrees with the feed's postimages + inserts
    base = _scratch(sf_dir, "delta_merge_cdf")
    snap = delta_snapshot(spark, base)
    assert snap.filter("o_orderkey >= 1000000000").count() == kinds["insert"]
