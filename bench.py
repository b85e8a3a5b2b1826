"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<key>": sec, ...}, "sf": <sf>,
     "sf1": {"sf": <10x sf>, "value": ..., "queries": {...}}}

The "sf1" section (round-4 verdict ask #1) re-runs the same headline at a
synthesized 10× replication of the input (scripts/make_sf_scaled.py —
~3 s, deterministic, reused across runs) so every BENCH_r{N}.json carries
BOTH scales: sf0.1 measures Spark's fixed per-job floor, the 10× scale is
where plan quality dominates (the round-3 ratio-vs-scale study, now a
per-round artifact instead of an ad-hoc run). Disable with
SPARK_GRAFT_BENCH_SF1=0; any sf1 failure degrades to the primary-only
line rather than breaking the contract.

Each query is fully materialized via a noop sink (executes the whole plan,
no driver collect). Session startup is excluded; the session is warmed
with a trivial action first.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sap_cta_data_pipeline_spark.registry import QUERIES  # noqa: E402
from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402
import sap_cta_data_pipeline_spark.operators  # noqa: E402,F401

#: Representative, perf-sensitive subset: scan, filter, agg, multiway join,
#: as-of, window, rollup, JSON, text, dedup (exact + minhash), knn,
#: centroid, sessionization, param sweep.
HEADLINE = [
    "scan_pushdown",
    "filter_range",
    "agg_pricing_summary",
    "agg_rollup",
    "join_multiway",
    "join_asof",
    "win_topn_per_group",
    "json_extract_typed",
    "text_tfidf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_lang_id",
    "dedup_near_embedding",
    "sim_knn_cosine",
    "emb_centroid_by_label",
    "stream_session",
    "pipe_param_sweep",
    "json_shred_materialized",
]

_SF1_DIR = "/tmp/spark_graft_sf1"
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_sf1(src_dir: str) -> str | None:
    """Synthesize (or reuse) the 10× replication of src_dir; None on any
    failure so the primary bench line survives."""
    import subprocess

    try:
        if not all(
            os.path.exists(os.path.join(_SF1_DIR, f"{t}.parquet")) for t in _TABLES
        ):
            subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "scripts", "make_sf_scaled.py"),
                    src_dir,
                    _SF1_DIR,
                    "10",
                ],
                check=True,
                capture_output=True,
                timeout=600,
            )
        return _SF1_DIR
    except Exception as ex:  # noqa: BLE001 — degrade, never break the contract
        print(f"sf1 synthesis failed: {ex}", file=sys.stderr)
        return None


def _run_headline(spark, sf_dir: str, n_runs: int) -> dict[str, float]:
    timings: dict[str, float] = {}
    for key in HEADLINE:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            _materialize(QUERIES[key](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[key] = round(best, 3)
        print(f"{key}: {timings[key]}s", file=sys.stderr)
    return timings


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.abspath(sf_dir.rstrip("/"))))
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("sap-cta-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))  # warm JVM/codegen paths
    # warm the parquet source path too (vectorized reader + footer codec
    # class-loading, ~2-5 s once per JVM) on the 5-row region table.  Note
    # region IS read by join_multiway later, so its 5-row footer/page cache
    # is pre-warmed — negligible data, but the big measured tables
    # (lineitem/orders/documents/embeddings) are not touched.
    from sap_cta_data_pipeline_spark.catalog import table_path

    spark.read.parquet(table_path(sf_dir, "region")).count()
    # NOTE: caching base tables was measured and REJECTED — InMemoryRelation
    # columnar scans of array<float> are slower than the parquet vectorized
    # reader for the higher-order-function-heavy vector ops (param sweep
    # 3.1s → 10.5s cached). The OS page cache already serves the re-scans.

    # min of two materializations per query: the build box carries
    # uncontrollable external load (round-2 driver numbers moved ±50%
    # run-to-run with unchanged plans), and min-of-N is the standard
    # load-robust wall-clock estimator. Run 1 also pays one-time
    # plan-compile + Python-worker spawn; run 2 measures the plan.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings = _run_headline(spark, sf_dir, n_runs)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        sf1_dir = _ensure_sf1(sf_dir)
        if sf1_dir is not None:
            try:
                print(f"== 10x scale ({sf1_dir}) ==", file=sys.stderr)
                t1 = _run_headline(spark, sf1_dir, n_runs)
                out["sf1"] = {
                    "sf": round(sf * 10, 3),
                    "value": round(sum(t1.values()), 3),
                    "queries": t1,
                }
            except Exception as ex:  # noqa: BLE001
                print(f"sf1 bench failed: {ex}", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
