"""Batch EN pins — writer-emitted bounds prune correctly; exact 1-D
k-means beats Lloyd-style local optima on a planted trap."""

from __future__ import annotations

import math

from sap_cta_data_pipeline_spark.operators.surface34 import (
    _N_FILES,
    _sorted_fixture,
    part_kmeans1d_exact,
)


def test_sorted_write_bounds_prune(spark, sf_dir):
    from pyspark.sql import functions as F

    from sap_cta_data_pipeline_spark.catalog import load_table
    from sap_cta_data_pipeline_spark.operators.surface21 import (
        iceberg_stats_plan,
    )

    base = _sorted_fixture(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 41 = 0")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    # full range: all files; narrow range inside one quartile: 1 file
    assert len(iceberg_stats_plan(base, 1, 0, mx, "long")) == _N_FILES
    narrow = iceberg_stats_plan(base, 1, 0, 1, "long")
    assert len(narrow) == 1
    # the file set for the lane's quartile range is a strict subset
    mid = iceberg_stats_plan(base, 1, mx // 4, mx // 2, "long")
    assert 1 <= len(mid) < _N_FILES
    # bounds are TRUE: every file's rows lie within its declared range
    # (verified transitively: reading the pruned set yields exactly the
    # filtered subset)
    got = (
        spark.read.parquet(*mid)
        .filter(F.col("o_orderkey").between(mx // 4, mx // 2))
        .count()
    )
    want = o.filter(F.col("o_orderkey").between(mx // 4, mx // 2)).count()
    assert got == want


def test_kmeans1d_exact_optimality(spark, sf_dir):
    rows = part_kmeans1d_exact.__wrapped__(spark, sf_dir).collect()
    assert {r.cluster for r in rows} == {1, 2, 3}
    # clusters are contiguous in value order
    by_v = sorted(rows, key=lambda r: (r.revenue,))
    seq = [r.cluster for r in by_v]
    assert seq == sorted(seq), "optimal 1-D clusters must be contiguous"

    # exhaustive python check: the lane's SS equals the global minimum
    vals = sorted(r.revenue for r in rows)

    def ss(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    best = min(
        ss(vals[:i]) + ss(vals[i:j]) + ss(vals[j:])
        for i in range(1, len(vals) - 1)
        for j in range(i + 1, len(vals))
    )
    lane_ss = sum(
        ss([r.revenue for r in rows if r.cluster == c]) for c in (1, 2, 3)
    )
    assert math.isclose(lane_ss, best, rel_tol=1e-9)
