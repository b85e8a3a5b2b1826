"""Batch DZ pins — Hilbert curve validity (bijection + unit adjacency)
and Iceberg stats-prune planned-file-set semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.surface21 import (
    hilbert_xy2d_col,
    ib_single_value,
    ib_single_value_decode,
    iceberg_stats_plan,
    layout_hilbert_cluster,
    _stats_fixture,
)


def _xy2d_ref(n: int, x: int, y: int) -> int:
    """Independent python reference: the s-local-rotation variant the
    lane's staged arithmetic implements."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_bijection_and_unit_adjacency(spark):
    # full 256x256 grid through the LANE's staged Spark arithmetic
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )
    out = hilbert_xy2d_col(grid, F.col("x"), F.col("y"))
    rows = out.collect()
    d_of = {(r.pa, r.sb): r.hkey for r in rows}
    assert len(set(d_of.values())) == 256 * 256, "bijection"
    assert min(d_of.values()) == 0 and max(d_of.values()) == 256 * 256 - 1
    pts = {d: xy for xy, d in d_of.items()}
    for d in range(0, 256 * 256 - 1, 97):  # sampled adjacency walk
        (x1, y1), (x2, y2) = pts[d], pts[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, "unit-step adjacency"
    # spot-check against the python reference
    for x, y in [(0, 0), (255, 0), (0, 255), (255, 255), (123, 45)]:
        assert d_of[(x, y)] == _xy2d_ref(256, x, y)


def test_hilbert_envelopes_tighter_than_zorder(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.training_prep import (
        layout_zorder_cluster,
    )

    def spread(rows):
        return sum(
            (r.max_part - r.min_part) + (r.max_supp - r.min_supp)
            for r in rows
        ) / len(rows)

    h = spread(layout_hilbert_cluster.__wrapped__(spark, sf_dir).collect())
    z = spread(layout_zorder_cluster.__wrapped__(spark, sf_dir).collect())
    # Hilbert buckets must not be WORSE than Morton on the same grid
    assert h <= z + 1e-9


def test_iceberg_stats_plan_file_set(spark, sf_dir):
    base = _stats_fixture(spark, sf_dir)
    names = lambda ps: [p.rsplit("/", 1)[1] for p in ps]  # noqa: E731
    assert names(iceberg_stats_plan(base, 1, 7, 12)) == [
        "range-10-14.parquet",
        "range-5-9.parquet",
    ]
    # boundary-inclusive: exactly one file for a point query on an edge
    assert names(iceberg_stats_plan(base, 1, 4, 4)) == ["range-0-4.parquet"]
    # full range: nothing pruned; disjoint range: everything pruned
    assert len(iceberg_stats_plan(base, 1, 0, 24)) == 5
    assert iceberg_stats_plan(base, 1, 100, 200) == []
    # a field with NO bounds is never pruned (presence rule)
    assert len(iceberg_stats_plan(base, 99, 0, 0)) == 5


def test_single_value_serialization_roundtrip():
    for v in (0, 1, -1, 7, 2**31 - 1, -(2**31)):
        assert ib_single_value_decode(ib_single_value(v, "int"), "int") == v
    for v in (0, -5, 2**62, -(2**62)):
        assert ib_single_value_decode(ib_single_value(v, "long"), "long") == v
    # spec: little-endian fixed width
    assert ib_single_value(1, "int") == b"\x01\x00\x00\x00"
    assert ib_single_value(1, "long") == b"\x01" + b"\x00" * 7
