"""Baseline measurement (BASELINE.md Phase 6): DuckDB wall-clock running
the oracle SQL vs Spark running the engine queries, same parquet, same
machine, sf0.1. Median of 3 after 1 warm-up, per headline key.

Usage: python scripts/bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE, _materialize  # noqa: E402
from sap_cta_data_pipeline_spark.catalog import TABLE_NAMES  # noqa: E402
from sap_cta_data_pipeline_spark.registry import ORACLES, QUERIES  # noqa: E402
from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402
import sap_cta_data_pipeline_spark.operators  # noqa: E402,F401


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = [k for k in HEADLINE if k in ORACLES]

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    spark = get_spark("bench-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))

    rows = []
    for key in keys:
        duck_times, spark_times = [], []
        for i in range(4):
            t0 = time.perf_counter()
            con.execute(ORACLES[key]).fetchall()
            if i:
                duck_times.append(time.perf_counter() - t0)
        for i in range(4):
            t0 = time.perf_counter()
            _materialize(QUERIES[key](spark, sf_dir))
            if i:
                spark_times.append(time.perf_counter() - t0)
        d, s = statistics.median(duck_times), statistics.median(spark_times)
        rows.append({"key": key, "duckdb_s": round(d, 3), "spark_s": round(s, 3),
                     "ratio": round(s / d, 2)})
        print(f"{key:26s} duckdb={d:7.3f}s spark={s:7.3f}s ratio={s/d:6.2f}", file=sys.stderr)

    # Round-10 (verdict What's-wrong #3): identity-oracle writer-lane
    # keys (scan_delta_dv: Spark does real log replay + DV decode while
    # DuckDB re-reads a 25-row final state in ~2 ms) distort the ratio
    # aggregate — their "ratio" measures oracle shape, not plan quality.
    # They are reported as an absolute-wall lane OUTSIDE the aggregate.
    WALL_ONLY = {"scan_delta_dv"}
    agg = [r for r in rows if r["key"] not in WALL_ONLY]
    wall = [r for r in rows if r["key"] in WALL_ONLY]
    total_d = sum(r["duckdb_s"] for r in agg)
    total_s = sum(r["spark_s"] for r in agg)
    print(json.dumps({"sf_dir": sf_dir, "per_query": rows,
                      "total_duckdb_s": round(total_d, 3),
                      "total_spark_s": round(total_s, 3),
                      "total_ratio": round(total_s / total_d, 2),
                      "wall_only_lanes": {
                          r["key"]: r["spark_s"] for r in wall
                      }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
