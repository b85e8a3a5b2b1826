"""Batch EO pins — shrinkage properties of the empirical-Bayes
estimator."""

from __future__ import annotations

from sap_cta_data_pipeline_spark.operators.surface35 import (
    events_eb_rate_shrinkage,
)


def test_shrinkage_properties(spark, sf_dir):
    rows = events_eb_rate_shrinkage.__wrapped__(spark, sf_dir).collect()
    assert rows
    # recover the prior mean from the fit: as n -> inf shrunk -> raw,
    # and the implied prior mean is where n=0 users would land
    raws = [r.raw_rate for r in rows]
    m = sum(raws) / len(raws)
    for r in rows:
        lo, hi = sorted((r.raw_rate, m))
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6, (
            "shrunk rate must lie between the raw rate and the prior mean"
        )
        assert 0.0 <= r.shrunk_rate <= 1.0
    # shrinkage strength decreases with n: among users whose raw rate
    # deviates from the prior in the same direction, bigger-n users
    # keep more of their raw rate
    movers = [
        (r.n_events, abs(r.shrunk_rate - r.raw_rate) / max(abs(r.raw_rate - m), 1e-9))
        for r in rows
        if abs(r.raw_rate - m) > 0.02
    ]
    assert movers
    big = [s for n, s in movers if n >= sorted(n for n, _ in movers)[len(movers) // 2]]
    small = [s for n, s in movers if n < sorted(n for n, _ in movers)[len(movers) // 2]]
    if big and small:
        assert sum(big) / len(big) <= sum(small) / len(small) + 1e-6
