"""Sketch mergeability (VERDICT r1 item 8, SCALE.md §D): persisted
per-partition sketches re-merged must equal the one-shot computation —
the property that makes approximate aggs re-aggregable at 100 TB without
re-scanning raw data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_hll_persisted_merge_equals_oneshot(spark, sf_dir, tmp_path):
    """Per-group HLL sketches written to parquet, read back, union-merged:
    the estimate must EXACTLY equal the one-shot whole-table sketch
    estimate (same sketch algebra), and sit within HLL error of exact."""
    c = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "sketches")
    c.groupBy("c_nationkey").agg(F.hll_sketch_agg("c_custkey").alias("sk")).write.parquet(path)
    merged = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    oneshot = (
        c.agg(F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est"))
        .collect()[0]
        .est
    )
    exact = c.select("c_custkey").distinct().count()
    assert merged == oneshot
    assert abs(merged - exact) / exact < 0.05  # lgConfigK default ≈ 1.6% rse


def test_hll_merge_is_associative_over_regroupings(spark, sf_dir):
    """Merging nation-grain sketches and merging mktsegment-grain sketches
    must estimate the same global cardinality — sketch merge cannot depend
    on how the data was partitioned when the sketches were built."""
    c = load_table(spark, sf_dir, "customer")

    def merged_est(group_col):
        return (
            c.groupBy(group_col)
            .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()[0]
            .est
        )

    assert merged_est("c_nationkey") == merged_est("c_mktsegment")


def test_histogram_quantile_merge_equals_direct(spark, sf_dir):
    """Bucket-wise addition of per-group fixed-width histograms must give
    the identical global histogram (and thus identical quantile edges) as
    histogramming the raw table directly."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_quantity") / 2.0).cast("long"), F.lit(24))
    direct = {
        r.bucket: r.n
        for r in li.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    merged = {
        r.bucket: r.n
        for r in (
            li.groupBy("l_returnflag", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("bucket")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
    }
    assert merged == direct


def test_registered_sketch_ops_run(spark, sf_dir):
    hll = QUERIES["agg_hll_mergeable"](spark, sf_dir).collect()
    assert len(hll) == 1 and bool(hll[0].merged_equals_oneshot)
    q = QUERIES["agg_quantile_mergeable"](spark, sf_dir).collect()[0]
    assert q.p50_edge <= q.p90_edge <= q.p99_edge
