"""Batch GL pins — net-effect changelog windows: per-commit windows
compose to the net state, intra-window births never leak, and the
reversed net window re-materializes exactly the net rows."""

from __future__ import annotations

from sap_cta_data_pipeline_spark.operators.surface54 import iceberg_changelog
from sap_cta_data_pipeline_spark.operators.surface62 import _net_fixture

SF = "/root/testdata/sf0.001"


def test_per_commit_windows_compose_to_net(spark):
    """Replaying (6001→6002) then (6002→6003) and netting per (key,
    change) must equal the endpoint diff (6001→6003): the per-commit
    feed shows 101/103 as INSERT-then-DELETE; the net window shows
    neither."""
    base = _net_fixture(spark, SF)
    w1 = iceberg_changelog(spark, base, 6001, 6002).collect()
    w2 = iceberg_changelog(spark, base, 6002, 6003).collect()
    net = iceberg_changelog(spark, base, 6001, 6003).collect()
    assert sorted(r.n_nationkey for r in w1) == [100, 101, 102, 103, 104]
    assert all(r.change_type == "INSERT" for r in w1)
    assert sorted(r.n_nationkey for r in w2) == [7, 101, 103]
    assert all(r.change_type == "DELETE" for r in w2)
    # composition: per-key net of (w1 + w2) == endpoint diff
    tally: dict[int, int] = {}
    for r in list(w1) + list(w2):
        tally[r.n_nationkey] = tally.get(r.n_nationkey, 0) + (
            1 if r.change_type == "INSERT" else -1
        )
    composed = {k: v for k, v in tally.items() if v != 0}
    direct = {
        r.n_nationkey: (1 if r.change_type == "INSERT" else -1) for r in net
    }
    assert composed == direct
    assert sorted(direct) == [7, 100, 102, 104]


def test_net_window_never_leaks_intra_window_births(spark):
    base = _net_fixture(spark, SF)
    rows = iceberg_changelog(spark, base, 6001, 6003).collect()
    keys = {r.n_nationkey for r in rows}
    assert 101 not in keys and 103 not in keys


def test_reversed_net_window(spark):
    """6003→6001 is the rollback feed: DELETE the three surviving new
    rows, re-INSERT base key 7."""
    base = _net_fixture(spark, SF)
    rows = iceberg_changelog(spark, base, 6003, 6001).collect()
    by = {(r.n_nationkey, r.change_type) for r in rows}
    assert by == {
        (100, "DELETE"), (102, "DELETE"), (104, "DELETE"), (7, "INSERT"),
    }
