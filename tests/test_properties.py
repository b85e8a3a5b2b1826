"""Property / metamorphic tests (SURVEY.md §5.2.5): algebraic identities
that must hold on the real tables regardless of data values — they catch
whole classes of operator bugs (lost rows, double counting, nondeterminism)
without an oracle in the loop."""

from __future__ import annotations

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_union_all_count_additivity(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    n_o = o.filter("o_orderstatus = 'O'").count()
    n_f = o.filter("o_orderstatus = 'F'").count()
    assert QUERIES["set_union_all"](spark, sf_dir).count() == n_o + n_f


def test_union_intersect_except_partition(spark, sf_dir):
    """|A∪B| = |A\\B| + |B\\A| + |A∩B| on distinct custkey sets."""
    union = QUERIES["set_union_distinct"](spark, sf_dir).count()
    inter = QUERIES["set_intersect"](spark, sf_dir).count()
    a_minus_b = QUERIES["set_except"](spark, sf_dir).count()
    o = load_table(spark, sf_dir, "orders")
    b_minus_a = (
        o.filter("o_orderstatus = 'F'").select("o_custkey").distinct()
        .subtract(o.filter("o_orderstatus = 'O'").select("o_custkey").distinct())
        .count()
    )
    assert union == a_minus_b + b_minus_a + inter


def test_filter_projection_commute(spark, sf_dir):
    projected = QUERIES["project_select"](spark, sf_dir)
    a = projected.filter(F.col("net_price") > 30000).count()
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.filter(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6) > 30000)
        .count()
    )
    assert a == b


def test_fk_join_preserves_fact_rows(spark, sf_dir):
    """orders⋈customer on an intact FK neither drops nor duplicates facts."""
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert QUERIES["join_inner"](spark, sf_dir).count() == n_orders


def test_semi_anti_partition_dimension(spark, sf_dir):
    """semi('F') + anti(any) ≤ customers; anti + distinct-custkey-of-orders
    partitions the customer table exactly."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    without = QUERIES["join_anti"](spark, sf_dir).count()
    assert with_orders + without == c.count()


def test_topk_deterministic_across_runs(spark, sf_dir):
    a = [tuple(r) for r in QUERIES["topk_limit"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["topk_limit"](spark, sf_dir).collect()]
    assert a == b and len(a) == 10


def test_tfidf_invariant_to_partitioning(spark, sf_dir):
    """tf-idf scores must not depend on physical layout: run the SAME op
    body over documents repartitioned to a prime partition count (and an
    awkward 1-partition coalesce) and compare full result sets."""
    from sap_cta_data_pipeline_spark.operators.text import tfidf_topk_frame

    docs = load_table(spark, sf_dir, "documents")
    base = {tuple(r) for r in tfidf_topk_frame(docs).collect()}
    shuffled = {tuple(r) for r in tfidf_topk_frame(docs.repartition(13)).collect()}
    single = {tuple(r) for r in tfidf_topk_frame(docs.coalesce(1)).collect()}
    assert base == shuffled == single


def test_dedup_exact_group_accounting(spark, sf_dir):
    """Σ(n_dups) over dup groups + unique docs == total docs."""
    docs = load_table(spark, sf_dir, "documents")
    fingerprint = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.filter(F.split("text", " "), lambda x: x != "")))
    )
    n_docs = docs.count()
    n_distinct = docs.select(fingerprint.alias("fp")).distinct().count()
    groups = QUERIES["dedup_exact"](spark, sf_dir)
    agg = groups.agg(
        F.count(F.lit(1)).alias("g"), F.sum("n_dups").alias("docs_in_groups")
    ).collect()[0]
    assert n_docs - n_distinct == agg.docs_in_groups - agg.g


def test_knn_output_shape_and_bounds(spark, sf_dir):
    pdf = QUERIES["sim_knn_cosine"](spark, sf_dir).toPandas()
    assert (pdf.groupby("probe_id").size() == 5).all()
    assert ((pdf["cos_sim"] <= 1.000001) & (pdf["cos_sim"] >= -1.000001)).all()
    assert (pdf["probe_id"] != pdf["cand_id"]).all()


def test_session_spans_within_bounds(spark, sf_dir):
    """No intra-session gap exceeds 30 min ⇒ span < 30 min × n_events."""
    pdf = QUERIES["stream_session"](spark, sf_dir).toPandas()
    assert (pdf["span_us"] <= (pdf["n_events"] - 1).clip(lower=0) * 1_800_000_000).all()
    assert (pdf["n_events"] > 0).all()
