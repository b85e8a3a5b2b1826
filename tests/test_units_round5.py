"""Round-5 unit pins: schema-discovery shred, HLL rollup accuracy, and
the minhash scoring-join gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    return lambda key: QUERIES[key](spark, sf_dir)


def test_shred_discover_finds_three_typed_keys(q):
    rows = {r.key: r for r in q("json_shred_discover").collect()}
    assert set(rows) == {"k", "t", "v"}
    assert rows["k"].inferred_type == "bigint"
    assert rows["t"].inferred_type == "string"
    assert rows["v"].inferred_type == "double"
    for r in rows.values():
        assert r.n_nonnull > 0
        assert 0 < r.n_distinct <= r.n_nonnull


def test_shred_discover_steady_state_stable(q):
    """Second call reuses both _SUCCESS-marked materializations and must
    answer identically (the shred-on-ingest amortization contract)."""
    r1 = sorted(map(tuple, q("json_shred_discover").collect()))
    r2 = sorted(map(tuple, q("json_shred_discover").collect()))
    assert r1 == r2


def test_type_inference_narrowest_wins(spark):
    """Inference rule in isolation: all-int strings -> bigint survives;
    one decimal poisons to double; one alpha poisons to string."""
    docs = spark.createDataFrame(
        [('{"a": 1, "b": 2.5, "c": 3}',), ('{"a": 7, "b": 1, "c": "x"}',)],
        "doc string",
    )
    def fails(key, typ):
        return docs.select(
            F.count(
                F.when(
                    F.get_json_object("doc", f"$.{key}").isNotNull()
                    & F.expr(
                        f"try_cast(get_json_object(doc, '$.{key}') AS {typ})"
                    ).isNull(),
                    1,
                )
            ).alias("f")
        ).collect()[0].f

    assert fails("a", "bigint") == 0
    assert fails("b", "bigint") == 1 and fails("b", "double") == 0
    assert fails("c", "bigint") == 1 and fails("c", "double") == 1


def test_hll_rollup_within_5pct_of_exact(q):
    exact = {r.k_bucket: r for r in q("json_shred_materialized").collect()}
    approx = {r.k_bucket: r for r in q("json_shred_rollup_hll").collect()}
    assert set(exact) == set(approx)
    for b in exact:
        assert approx[b].n == exact[b].n  # counts stay exact
        assert approx[b].avg_value == exact[b].avg_value
        rel = abs(approx[b].n_users_approx - exact[b].n_users) / max(
            exact[b].n_users, 1
        )
        assert rel < 0.05, f"bucket {b}: rel err {rel:.3f}"


def test_minhash_scoring_attach_respects_gate(spark, sf_dir):
    """Below the broadcast ceiling the scoring joins must broadcast
    (plan contains BroadcastHashJoin feeding the est_jaccard filter);
    the shuffle-hash swap is gated on corpus size, not hardcoded."""
    plan = QUERIES["dedup_minhash_lsh"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minhash_scoring_swaps_past_broadcast_ceiling(spark, sf_dir, monkeypatch):
    """Past _SCORING_BROADCAST_MAX distinct docs the same plan must use
    keyed shuffle-hash scoring joins instead of broadcasting a
    corpus-sized signature table (threshold forced to 0 to exercise the
    huge-corpus branch on the fixture corpus)."""
    from sap_cta_data_pipeline_spark.operators import text as text_ops

    monkeypatch.setattr(text_ops, "_SCORING_BROADCAST_MAX", 0)
    # round 13 added the numpy tier BELOW the broadcast tier — zero it
    # too so the huge-corpus branch is the one exercised
    monkeypatch.setattr(text_ops, "_SCORING_NUMPY_MAX", 0)
    plan = (
        QUERIES["dedup_minhash_lsh"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan


# ---------------------------------------------------------------- batch BQ


def test_prefix_filter_equals_quadratic_lane(spark, sf_dir):
    """Prefix filtering is an EXACT optimization: byte-identical result
    set to the all-token equijoin lane (the theorem in the docstring,
    checked end-to-end here on top of the shared-oracle hash match)."""
    a = {(r.doc_a, r.doc_b): r.jaccard for r in QUERIES["dedup_near_jaccard"](spark, sf_dir).collect()}
    b = {(r.doc_a, r.doc_b): r.jaccard for r in QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir).collect()}
    assert a == b


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The point of the prefix: candidate pairs from prefix tokens must
    be a strict subset of pairs sharing ANY token (else it prunes
    nothing and the lane is the quadratic twin with extra steps)."""
    from sap_cta_data_pipeline_spark.catalog import load_table
    from sap_cta_data_pipeline_spark.operators.text import _tokens

    tok = _tokens(load_table(spark, sf_dir, "documents")).distinct()
    df_counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    by_doc = (
        tok.join(df_counts, "term")
        .groupBy("doc_id", "lang")
        .agg(F.array_sort(F.collect_list(F.struct("df", "term"))).alias("toks"))
        .select(
            "doc_id", "lang",
            F.transform("toks", lambda s: s["term"]).alias("terms"),
            F.size("toks").alias("n_terms"),
        )
    )
    plen = (F.col("n_terms") - F.ceil(F.lit(0.8) * F.col("n_terms")) + 1).cast("int")
    prefixes = by_doc.select("doc_id", "lang", F.explode(F.slice("terms", 1, plen)).alias("term"))

    def npairs(frame):
        a = frame.select(F.col("doc_id").alias("a"), "lang", "term")
        b = frame.select(F.col("doc_id").alias("b"), "lang", "term")
        return (
            a.join(b, ["lang", "term"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct().count()
        )

    n_prefix = npairs(prefixes)
    n_full = npairs(tok)
    assert 0 < n_prefix < n_full


def test_cogrouped_asof_matches_builtin_formulation(spark, sf_dir):
    """The cogrouped-map pandas merge_asof must agree with the built-in
    window/join formulation of the same as-of semantics."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select("user_id", F.col("ts").alias("vts"), "value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    from pyspark.sql import Window

    cand = (
        purchases.join(views, "user_id")
        .filter(F.col("vts") < F.col("pts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(F.col("vts").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_id", "vts", "value")
    )
    expected = {
        r.event_id: (r.vts, round(r.value, 6)) if r.vts is not None else None
        for r in purchases.join(cand, "event_id", "left").select(
            "event_id", "vts", "value"
        ).collect()
    }
    got = {
        r.purchase_id: (r.last_view_ts, r.last_view_value)
        if r.last_view_ts is not None
        else None
        for r in QUERIES["join_cogrouped_asof"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == expected[k], k


def test_normalize_arrow_matches_jvm_twin(spark, sf_dir):
    """mapInArrow numpy path == the pure-JVM transform/fold expression
    (same sequential double arithmetic by construction)."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    jvm = {
        r.vec_id: r.unit
        for r in emb.select(
            "vec_id",
            F.transform("embedding", lambda x: F.round(x.cast("double") / nrm, 6)).alias("unit"),
        ).collect()
    }
    arrow = {
        r.vec_id: r.unit
        for r in QUERIES["emb_normalize_arrow"](spark, sf_dir).collect()
    }
    assert jvm == arrow


def test_delta_version_diff_classification_and_pruning(spark, sf_dir):
    rows = QUERIES["scan_delta_version_diff"](spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        if r.n_nationkey < 12:
            assert r.change == "updated" and r.name_v0 == r.name_latest + "-old"
        else:
            assert r.change == "unchanged" and r.name_v0 == r.name_latest
    # scale contract: only symmetric-difference files are scanned — the
    # orphan and checkpoint parquet never enter the plan
    files = QUERIES["scan_delta_version_diff"](spark, sf_dir).inputFiles()
    assert all("orphan" not in f and "checkpoint" not in f for f in files)
    assert {f.rsplit("/", 1)[-1] for f in files} == {
        "part-a.parquet", "part-b.parquet", "part-c.parquet", "part-e.parquet"
    }


def test_mutual_information_nonnegative_total(spark, sf_dir):
    rows = QUERIES["stats_mutual_information"](spark, sf_dir).collect()
    mi = sum(r.mi_contrib for r in rows)
    assert mi >= -1e-9
    assert all(r.n > 0 for r in rows)


def test_zipf_slope_negative(spark, sf_dir):
    rows = QUERIES["text_zipf_fit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope < 0, r
        assert 0.0 <= r.fit_r2 <= 1.0 + 1e-9, r


def test_multiway_fact_join_is_shuffle_hash(spark, sf_dir):
    """The fact edge must plan as ShuffledHashJoin (round 5): sort-merge
    sorts the entire probe stream for nothing — the build side is the
    dimension-reduced, date-bounded order stream (measured 13 s → 4.8 s
    at the 180M-row sf30 rung)."""
    plan = (
        QUERIES["join_multiway"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------- batch BR


def test_bloom_prefilter_actually_prunes(spark, sf_dir):
    """The bitmap pre-filter must pass every true-matching fact row (the
    oracle certifies no loss) while pruning most non-matching ones —
    otherwise it is overhead, not a runtime filter."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    m_bits = 1 << 22
    pos_o = F.pmod(F.xxhash64("o_orderkey"), F.lit(m_bits))
    bitmap = (
        o.select(
            F.floor(pos_o / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(pmod(pmod(xxhash64(o_orderkey), 4194304), 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    pos_l = F.pmod(F.xxhash64("l_orderkey"), F.lit(m_bits))
    fact = li.select(
        "l_orderkey",
        F.floor(pos_l / 64).cast("long").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(pmod(pmod(xxhash64(l_orderkey), 4194304), 64) AS INT))"
        ).alias("mask"),
    ).join(F.broadcast(bitmap), "word")
    n_cand = fact.filter(F.col("mask").bitwiseAND(F.col("bits")) != 0).count()
    n_true = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    n_all = li.count()
    assert n_true <= n_cand < n_all


def test_geo_grid_unique_probe_rows(spark, sf_dir):
    df = QUERIES["geo_grid_distance_join"](spark, sf_dir)
    rows = df.collect()
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.dist_km >= 0 for r in rows)


def test_execute_immediate_rerun_is_idempotent(spark, sf_dir):
    a = sorted(map(tuple, QUERIES["sql_execute_immediate"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["sql_execute_immediate"](spark, sf_dir).collect()))
    assert a == b and len(a) == 2


# ---------------------------------------------------------------- batch BS


def test_mor_compaction_folds_deletes(spark, sf_dir, tmp_path):
    """Compaction must fold the delete sidecars into clean files: same
    rows back, and the read path needs no anti-join (no live sidecars)."""
    import shutil

    from sap_cta_data_pipeline_spark.operators.table_log import (
        _build_mor_fixture,
        txnlog_mor_compact,
        txnlog_mor_snapshot,
        txnlog_mor_state,
    )

    base = str(tmp_path / "mor")
    _build_mor_fixture(spark, sf_dir, base)
    before = sorted(map(tuple, txnlog_mor_snapshot(spark, base).collect()))
    _, dels = txnlog_mor_state(base)
    assert dels, "fixture must start with a live delete sidecar"
    txnlog_mor_compact(spark, base)
    after = sorted(map(tuple, txnlog_mor_snapshot(spark, base).collect()))
    assert after == before
    live, dels2 = txnlog_mor_state(base)
    assert dels2 == [] and live == ["compact-0"]
    shutil.rmtree(base, ignore_errors=True)


def test_mor_time_travel_predates_delete(spark, sf_dir, tmp_path):
    import shutil

    from sap_cta_data_pipeline_spark.operators.table_log import (
        _build_mor_fixture,
        txnlog_mor_snapshot,
    )

    base = str(tmp_path / "mor_tt")
    _build_mor_fixture(spark, sf_dir, base)
    v0 = txnlog_mor_snapshot(spark, base, version=0).count()
    v1 = txnlog_mor_snapshot(spark, base, version=1).count()
    assert v0 == 25 and v1 < 25
    shutil.rmtree(base, ignore_errors=True)


def test_pr_auc_bounds_and_baseline(spark, sf_dir):
    r = QUERIES["ml_pr_auc"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.pr_auc <= 1.0
    assert abs(r.baseline_ap - r.n_pos / (r.n_pos + r.n_neg)) < 1e-9


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = QUERIES["events_markov_stationary"](spark, sf_dir).collect()
    total = sum(r.stationary_p for r in rows)
    assert abs(total - 1.0) < 1e-3  # mass preserved (ergodic chain)
    assert all(r.stationary_p > 0 for r in rows)
