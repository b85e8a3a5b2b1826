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
    plan = (
        QUERIES["dedup_minhash_lsh"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
