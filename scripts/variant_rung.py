"""JSON-lane A/B rung (round-10 verdict ask #2): parse-per-query
(json_extract_typed) vs materialized typed shred
(json_shred_materialized) vs materialized native VARIANT
(json_variant_materialized), against the DuckDB oracle on the same
parquet. All three answer the identical bucketed rollup.

Method mirrors bench.py: each lane's fixture is pre-built untimed
(the materialized lanes' one-time parse+write is reported separately
as build_s), then each lane runs once untimed (warm) and the reported
wall is the MIN of 3 timed runs. DuckDB runs the shared oracle SQL,
median of 3 after 1 warm-up.

Usage: python scripts/variant_rung.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1_sparse)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import _materialize  # noqa: E402
from sap_cta_data_pipeline_spark.registry import ORACLES, QUERIES  # noqa: E402
from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402
import sap_cta_data_pipeline_spark.operators  # noqa: E402,F401

LANES = [
    "json_extract_typed",
    "json_shred_materialized",
    "json_variant_materialized",
]


def run_dir(spark, sf_dir: str) -> dict:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    duck = []
    for i in range(4):
        t0 = time.perf_counter()
        con.execute(ORACLES["json_extract_typed"]).fetchall()
        if i:
            duck.append(time.perf_counter() - t0)
    d = statistics.median(duck)

    out = {"sf_dir": sf_dir, "duckdb_s": round(d, 3), "lanes": {}}
    for key in LANES:
        # fixture build (materialized lanes): first call pays parse+write
        t0 = time.perf_counter()
        _materialize(QUERIES[key](spark, sf_dir))
        build = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(QUERIES[key](spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        out["lanes"][key] = {
            "build_s": round(build, 3),
            "warm_s": round(w, 3),
            "ratio_vs_duckdb": round(w / d, 2),
        }
        print(
            f"{os.path.basename(sf_dir):24s} {key:28s} "
            f"build={build:7.3f}s warm={w:7.3f}s ratio={w / d:6.2f}",
            file=sys.stderr,
        )
    return out


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1_sparse",
    ]
    spark = get_spark("variant-rung")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))
    results = [run_dir(spark, d) for d in dirs if os.path.isdir(d)]
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
