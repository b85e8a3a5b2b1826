#!/usr/bin/env python
"""MinHash scoring-tier handoff rung (round-14 verdict ask #8).

The pair lane has three measured scoring tiers keyed on the distinct
signature count: numpy matrix-gather (≤ _SCORING_NUMPY_MAX), JVM
broadcast zip-compare (≤ _SCORING_BROADCAST_MAX), keyed SHUFFLE_HASH
beyond. The 100 TB claim rests on the handoff between them being
byte-identical and on the post-gate tiers not inheriting the numpy
tier's per-worker matrix memory. This rung demonstrates the handoff on
one corpus: it runs dedup_minhash_lsh three times with the gates forced
so each tier engages in turn, asserts the three output digests are
EQUAL, checks the tier actually engaged (numpy → ArrowEvalPython in the
plan; shuffle-hash → ShuffledHashJoin and no broadcast of the signature
table), and reports wall seconds, driver RSS delta, and live
broadcast-block count per tier (the numpy tier's matrices must not leak
into the other tiers' runs — the retire-at-entry lifecycle).

Usage: python scripts/minhash_tier_rung.py [sf_dir]
       (default /tmp/spark_graft_sf1_sparse — the 10x dup-sparse bench
       corpus, 39k distinct signatures)

Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1_sparse"

    from sap_cta_data_pipeline_spark.registry import QUERIES
    from sap_cta_data_pipeline_spark.session import get_spark
    import sap_cta_data_pipeline_spark.operators  # noqa: F401
    from sap_cta_data_pipeline_spark.operators import text as tx
    from bench import _jvm_health

    spark = get_spark("minhash-tier-rung")
    spark.sparkContext.setLogLevel("ERROR")

    def digest(df):
        pdf = df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)
        return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]

    tiers = [
        # (tier name, numpy gate, broadcast gate, plan marker that must
        #  appear, plan marker that must NOT appear). The signature
        # COMPUTATION is a pandas UDF in every tier, so ArrowEvalPython
        # cannot discriminate; the JVM tiers are distinguished by their
        # zip-compare (zip_with), which the numpy tier must not contain.
        ("numpy", 10**9, 10**9, "ArrowEvalPython", "zip_with"),
        ("broadcast", 0, 10**9, "zip_with", "ShuffledHashJoin"),
        ("shuffle_hash", 0, 0, "ShuffledHashJoin", None),
    ]
    out = {"sf_dir": sf_dir, "tiers": {}}
    digests = {}
    for name, ngate, bgate, want, forbid in tiers:
        tx._SCORING_NUMPY_MAX = ngate
        tx._SCORING_BROADCAST_MAX = bgate
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.perf_counter()
        df = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        digests[name] = digest(df)
        wall = round(time.perf_counter() - t0, 2)
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert want in plan, f"{name}: expected {want} in plan"
        if forbid:
            assert forbid not in plan, f"{name}: {forbid} must not appear"
        out["tiers"][name] = {
            "wall_s": wall,
            "rows": None,  # rows equal across tiers iff digests equal
            "driver_rss_delta_mb": round((rss1 - rss0) / 1024, 1),
            "jvm": _jvm_health(spark),
            "digest": digests[name],
        }
    assert len(set(digests.values())) == 1, f"tier digests diverge: {digests}"
    out["digests_equal"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
