#!/usr/bin/env python
"""dedup_minhash_cluster sf10 working-set rung (round-11 verdict ask #6).

BASELINE.md round-11 recorded the finding as prose: the op OOMs the
default 16 g single-JVM heap at the sf10 dup-sparse corpus (500k docs)
and completes at 48 g — but the CC join stage's working set was never
MEASURED, so the sizing rule lived outside code. This rung runs the op
solo at a given heap and reports, per completed stage, Spark's
peakExecutionMemory (the unified-memory working set task-attributed to
the stage) plus the executor JVM peak, via the local status REST API —
turning "needs a bigger box" into a per-stage byte count that
functions/layout.py-style sizing can consume.

Usage: SPARK_GRAFT_DRIVER_MEM=32g python scripts/minhash_mem_rung.py \
           [sf_dir] [key]
       (defaults: /tmp/spark_graft_sf10_text dedup_minhash_cluster;
       the script force-enables the Spark UI itself — the status REST
       API it reads lives there)

Prints one JSON line: heap, wall, rows, top stages by peak execution
memory, executor JVM peak.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    # the status REST API read below lives on the Spark UI, which
    # get_spark disables by default for bench hygiene — force it on
    # BEFORE the session is built (round-13 advice fix: the documented
    # invocation left uiWebUrl None and crashed after the measured run)
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10_text"
    key = sys.argv[2] if len(sys.argv) > 2 else "dedup_minhash_cluster"

    import sap_cta_data_pipeline_spark.operators  # noqa: F401
    from bench import _materialize
    from sap_cta_data_pipeline_spark.registry import QUERIES
    from sap_cta_data_pipeline_spark.session import get_spark

    spark = get_spark("minhash-mem-rung")
    spark.sparkContext.setLogLevel("ERROR")
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    ui = spark.sparkContext.uiWebUrl

    t0 = time.perf_counter()
    df = QUERIES[key](spark, sf_dir)
    _materialize(df)
    wall = round(time.perf_counter() - t0, 2)
    rows = None  # noop-write materialization; row count not re-paid

    app = _get(f"{ui}/api/v1/applications")[0]["id"]
    stages = _get(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    top = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "peak_exec_mb": round(s.get("peakExecutionMemory", 0) / 2**20),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20),
                "tasks": s.get("numCompleteTasks"),
            }
            for s in stages
        ),
        key=lambda d: -d["peak_exec_mb"],
    )[:8]
    execs = _get(f"{ui}/api/v1/applications/{app}/executors")
    jvm_peak = max(
        (e.get("peakMemoryMetrics", {}) or {}).get("JVMHeapMemory", 0)
        for e in execs
    )
    print(
        json.dumps(
            {
                "minhash_mem_rung": {
                    "key": key,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "heap": heap,
                    "wall_s": wall,
                    "rows": rows,
                    "jvm_heap_peak_gb": round(jvm_peak / 2**30, 2),
                    "top_stages_by_peak_exec": top,
                }
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
