"""Round-3 batch-W unit pins that the driver's rows-only lane can't see."""

from __future__ import annotations

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_countmin_estimate_upper_bounds_exact(spark, sf_dir):
    rows = QUERIES["agg_countmin_mergeable"](spark, sf_dir).collect()
    assert len(rows) == 10
    # count-min property: the min-over-depths estimate NEVER undercounts
    assert all(r["est_ge_exact"] for r in rows)
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    # with width 256 vs the fixture's small user domain, most probes
    # should be collision-free (exact); require at least half
    exact_hits = sum(1 for r in rows if r["cms_est"] == r["exact_n"])
    assert exact_hits >= 5


def test_random_projection_is_shuffle_free(spark, sf_dir):
    from sap_cta_data_pipeline_spark.plans import digest

    d = digest(QUERIES["emb_random_projection"](spark, sf_dir))
    assert d.shuffle_free, "JL projection must plan as a pure projection"
