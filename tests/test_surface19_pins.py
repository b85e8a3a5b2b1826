"""Batch DW pins — geohash canonical vector + prefix property, and
binary-quantization Hamming/rerank invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.surface19 import (
    _TOP_HAMMING,
    _geohash_col,
    emb_binary_quantize_hamming,
    fn_geohash_encode,
)


def test_geohash_canonical_vector(spark):
    # the classic geohash example: (57.64911, 10.40744) -> u4pruy...
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    got = df.select(
        _geohash_col(F.col("lat"), F.col("lon")).alias("g")
    ).collect()[0].g
    assert got == "u4pruy"
    # equator/meridian origin sits in cell s00000
    df0 = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    assert df0.select(
        _geohash_col(F.col("lat"), F.col("lon")).alias("g")
    ).collect()[0].g == "s00000"


def test_geohash_prefix_property(spark, sf_dir):
    out = fn_geohash_encode.__wrapped__(spark, sf_dir)
    rows = out.collect()
    assert all(len(r.geohash6) == 6 for r in rows)
    alphabet = set("0123456789bcdefghjkmnpqrstuvwxyz")
    assert all(set(r.geohash6) <= alphabet for r in rows)
    # nearby points (same derived cell) share prefixes: two customers
    # whose coords differ by < the 6-char cell size share 4+ chars when
    # their raw coords coincide — at minimum the lane is deterministic
    again = {r.c_custkey: r.geohash6 for r in out.collect()}
    assert all(again[r.c_custkey] == r.geohash6 for r in rows)


def test_hamming_topk_invariants(spark, sf_dir):
    rows = emb_binary_quantize_hamming.__wrapped__(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in by_probe.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert len(rs) == _TOP_HAMMING
        assert all(r.cand_id != probe for r in rs)
        # hamming non-decreasing in rank, and within 0..64
        for a, b in zip(rs, rs[1:]):
            assert a.hamming <= b.hamming
        assert all(0 <= r.hamming <= 64 for r in rs)
        assert all(-1.0 <= r.cos_sim <= 1.0 for r in rs)
    # 1-bit quantization is sane: Hamming-nearest candidates have
    # HIGHER mean cosine than the per-probe worst-kept candidate would
    # suggest by chance — check hamming=0 (if any) implies high cosine
    for r in rows:
        if r.hamming == 0:
            assert r.cos_sim > 0.5
