"""Batch DT pins — spec-exact murmur3 bucket transform and
partition-spec evolution planning semantics."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sap_cta_data_pipeline_spark.functions.murmur3 import (
    bucket_long,
    bucket_long_np,
    murmur3_32_long,
    murmur3_32_long_np,
)


def test_murmur3_iceberg_spec_vector():
    # Iceberg spec Appendix B: hash(34) for int AND long is 2017239379
    # (both hash the little-endian 8 bytes of the 64-bit value, seed 0).
    assert murmur3_32_long(34) == 2017239379
    assert bucket_long(34, 16) == (2017239379 & 0x7FFFFFFF) % 16


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_murmur3_scalar_numpy_agree(v):
    got_np = murmur3_32_long_np(np.array([v], dtype=np.int64))[0]
    assert int(got_np) == murmur3_32_long(v)
    assert int(bucket_long_np(np.array([v], dtype=np.int64), 7)[0]) == bucket_long(v, 7)


def test_bucket_write_prunes_to_one_file(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.iceberg_partitioning import (
        _N_BUCKETS,
        _bucket_fixture,
        sink_iceberg_bucket_write,
    )
    from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
        iceberg_snapshot,
    )

    out = sink_iceberg_bucket_write.__wrapped__(spark, sf_dir)
    files = out.inputFiles()
    assert len(files) == 1, files
    assert f"bucket-{bucket_long(14, _N_BUCKETS)}.parquet" in files[0]
    assert out.collect()[0].n_nationkey == 14
    # full snapshot = identity over all buckets
    base = _bucket_fixture(spark, sf_dir)
    full = iceberg_snapshot(spark, base)
    assert full.count() == 25
    assert len(full.inputFiles()) == _N_BUCKETS
    # every key must read back from the file its murmur3 bucket names
    for key in (0, 7, 24):
        hit = iceberg_snapshot(
            spark,
            base,
            partition_filter={"n_nationkey_bucket": bucket_long(key, _N_BUCKETS)},
        ).filter(f"n_nationkey = {key}")
        assert hit.count() == 1


def test_spec_evolution_keeps_old_spec_file(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.iceberg_partitioning import (
        _evo_fixture,
        scan_iceberg_partition_evolution,
    )
    from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
        iceberg_state,
    )

    base = _evo_fixture(spark, sf_dir)
    # planning with the region filter keeps the unprunable spec-0 file
    # and exactly one spec-1 file
    _, data, _, _ = iceberg_state(base, partition_filter={"n_regionkey": 2})
    names = sorted(p["path"].rsplit("/", 1)[1] for p in data)
    assert names == ["all-early.parquet", "rk=2.parquet"]
    out = scan_iceberg_partition_evolution.__wrapped__(spark, sf_dir)
    rows = out.collect()
    assert {r.n_regionkey for r in rows} == {1, 2}
    assert len(rows) == 10  # 5 nations per region
    # snapshot 4001 (pre-evolution) still reads spec-0 only
    _, data1, _, _ = iceberg_state(base, snapshot_id=4001)
    assert [p["path"].rsplit("/", 1)[1] for p in data1] == ["all-early.parquet"]
