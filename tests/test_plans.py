"""Plan-shape assertions (SURVEY.md §5.2.6): the optimizer facts the scale
story depends on — pushdown, broadcast, top-k without full sort, partial
aggregation — verified against explain output so regressions surface as
test failures, not as 100×-slower clusters.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_scan_pushdown_reaches_parquet(q):
    plan = plan_text(q("scan_pushdown"))
    assert "PushedFilters: [" in plan
    # the shipdate range must actually push down, not just the scan existing
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # column pruning: only 3 of 11 lineitem columns in ReadSchema
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_quantity" not in read_schema and "l_tax" not in read_schema


def test_filter_range_pushdown(q):
    plan = plan_text(q("filter_range"))
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_broadcast_join_planned(q):
    assert "BroadcastHashJoin" in plan_text(q("join_broadcast"), "simple")


def test_dim_joins_auto_broadcast(q):
    # unhinted Q5-shape: the small dimensions must broadcast on their own
    assert "BroadcastHashJoin" in plan_text(q("join_multiway"), "simple")


def test_topk_uses_take_ordered(q):
    # global top-10 must not be a full sort: per-partition heaps + merge
    assert "TakeOrderedAndProject" in plan_text(q("topk_limit"), "simple")


def test_agg_is_partial_then_final(q):
    plan = plan_text(q("agg_pricing_summary"), "simple")
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_semi_anti_planned_as_joins(q):
    assert "LeftSemi" in plan_text(q("join_semi"), "simple")
    assert "LeftAnti" in plan_text(q("join_anti"), "simple")


def test_runtime_tuning_applied(spark, q):
    """tune() inside every registered query must leave the session with the
    scale-critical confs set, even on a driver-owned session."""
    q("agg_pricing_summary")  # any query applies tune()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_whole_stage_codegen_active(q):
    # the AQE pre-execution formatted plan hides codegen markers; the
    # codegen explain mode reports generated subtrees directly
    assert "WholeStageCodegen" in plan_text(q("agg_pricing_summary"), "codegen")


def test_ivf_assignment_shuffle_free(q):
    """Cell assignment must be in-row (broadcast centroids + array_sort
    argmin): no window over vec_id and no corpus-keyed Exchange — the only
    exchanges allowed are broadcasts, the tiny centroid build, and the
    final probe-partitioned top-k window (VERDICT r1 item 1)."""
    plan = plan_text(q("sim_ann_ivf"), "simple")
    assert "hashpartitioning(vec_id" not in plan
    # the only window spec left is the probe-partitioned top-k
    assert "windowspecdefinition(vec_id" not in plan
    assert plan.count("windowspecdefinition(probe_id") == 1


def test_subqueries_decorrelated_shapes(q):
    """The subquery family must plan as joins, never nested per-row plans:
    EXISTS/IN → LeftSemi, the uncorrelated scalar threshold → a broadcast
    (1-row relation), the Q17 correlated aggregate → a window over the
    correlation key (decorrelated — no re-aggregation join per outer row)."""
    assert "LeftSemi" in plan_text(q("sub_exists"), "simple")
    assert "LeftSemi" in plan_text(q("sub_in"), "simple")
    assert "Broadcast" in plan_text(q("sub_scalar_global"), "simple")
    plan = plan_text(q("sub_correlated_agg"), "simple")
    assert "windowspecdefinition(l_partkey" in plan


def test_salted_join_two_key(q):
    """The salted join must actually join on (key, salt) — both columns in
    the join keys — and keep a partial+final agg after it."""
    plan = plan_text(q("join_salted_skew"), "simple")
    join_line = next(l for l in plan.splitlines() if "Join" in l and "orderkey" in l)
    assert "salt" in join_line
    assert plan.count("HashAggregate") >= 2


def test_quantize_in_row_no_shuffle(q):
    """emb_quantize_int8 is pure per-row math: the plan must contain no
    Exchange at all (scan → project), the embarrassingly-parallel shape."""
    plan = plan_text(q("emb_quantize_int8"), "simple")
    assert "Exchange" not in plan


def test_ngram_freq_take_ordered(q):
    """Corpus bigram top-50 must be TakeOrderedAndProject (per-partition
    heaps), not a global Sort of the vocab²-keyed aggregate."""
    plan = plan_text(q("text_ngram_freq"), "simple")
    assert "TakeOrderedAndProject" in plan


def test_stream_topk_rank_is_window_partitioned(q):
    """The per-window rank must partition by window_start — no global
    window over all (window, type) rows."""
    plan = plan_text(q("stream_topk_windowed"), "simple")
    assert "windowspecdefinition(window_start" in plan


def test_bucketed_join_no_shuffle(q):
    """Both bucketed scans must feed the SortMergeJoin directly — the only
    Exchange in the plan is the tiny post-join aggregation shuffle, never
    a join-input shuffle (bucketed layout satisfies the join's
    distribution requirement)."""
    plan = plan_text(q("join_bucketed_colocated"), "simple")
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin")[1]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Bucketed: true" in join_part


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """A filter on the partition column of a partitioned parquet layout
    must become a PartitionFilter (directory pruning — at 100 TB this is
    skipping whole partitions, not reading-then-filtering), and must NOT
    appear in PushedFilters (it never reaches row groups)."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    path = str(tmp_path / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = plan_text(pruned)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_year" in pf


def test_runtime_bloom_filter_injectable(spark):
    """Spark's InjectRuntimeFilter adds a bloom-filter semi-join reduction
    (might_contain on the big side, bloom_filter_agg on the selective
    side) for shuffle joins. The size thresholds exist because at sf0.01
    everything is under the 10 GB application-side default — at 100 TB
    the DEFAULT confs trigger this on exactly the dq_expectations /
    TPC-H join shapes; here we lower them to prove the rule fires."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "0")
        spark.conf.set(keys[1], "100MB")
        spark.conf.set(keys[2], "-1")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        assert "might_contain" in plan_text(j).lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pii_redact_no_exchange(q):
    # per-row regex pass: the plan must contain no shuffle at all
    plan = plan_text(q("text_pii_redact"), "simple")
    assert "Exchange" not in plan
    assert "WholeStageCodegen" in plan_text(q("text_pii_redact"), "codegen")


def test_contamination_eval_set_broadcast(q):
    # the eval n-gram set must broadcast; the training corpus must not
    plan = plan_text(q("text_contamination_ngram"), "simple")
    assert "BroadcastHashJoin" in plan


def test_null_safe_join_is_hash_join(q):
    # <=> must plan as an equi hash join (broadcast), not nested-loop
    plan = plan_text(q("join_null_safe_eq"), "simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_not_in_plans_null_aware_anti_join(q):
    # NOT IN with a nullable subquery must plan as broadcast anti joins
    # (Spark's null-aware anti join prints as LeftAnti under AQE), never
    # as a cartesian/nested-loop filter
    plan = plan_text(q("sub_not_in_nulls"), "formatted")
    assert plan.count("BroadcastHashJoin LeftAnti") >= 2
    assert "CartesianProduct" not in plan


def test_triangle_closure_is_semi_join(q):
    plan = plan_text(q("graph_triangle_count"), "simple")
    assert "LeftSemi" in plan


def test_pmi_unigram_tables_broadcast(q):
    plan = plan_text(q("text_collocations_pmi"), "simple")
    assert plan.count("BroadcastHashJoin") >= 2


def test_zorder_is_single_agg_no_join(q):
    plan = plan_text(q("layout_zorder_cluster"), "simple")
    assert "Join" not in plan
    # partial+final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2
