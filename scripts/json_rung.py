#!/usr/bin/env python
"""json_extract_typed A/B rung (round-11 verdict ask #2): the one perf
letter NOT falling with scale (21.7x sf0.1 -> 22.6x sf1 -> 17.5x sf10).
The in-plan shape is already the one-parse ``from_json`` (A/B'd round 3
vs variant_get / get_json_object / regexp); the residual is the JVM
Jackson row-parse vs DuckDB's SIMD JSON. This rung A/Bs the LAST
untested lane: an Arrow-native parse — a scalar pandas UDF that joins
each Arrow batch of props strings into one NDJSON buffer and parses it
with pyarrow's multithreaded C++ JSON reader (explicit one-field
schema, unexpected fields ignored), so the per-row cost is C++ SIMD
work instead of JVM Jackson object churn. JSON strings cannot contain
raw newlines (they are escaped), so the NDJSON join is lossless.

Lanes, identical rollup (bucket -> count/avg/countDistinct):
  from_json   — the shipped plan (QUERIES["json_extract_typed"])
  arrow       — pandas-UDF pyarrow.json parse lane
  duckdb      — the oracle (json_extract_string, SIMD JSON)

Decision protocol (VERDICT round 11 #2): if the arrow lane brings the
ratio under ~8x it ships as the key's implementation; otherwise the
letter goes PERMANENT (engine parse floor) with ingest-side shredding
(json_shred_materialized, 5.03x and falling) documented as the
production path.

Usage: python scripts/json_rung.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1
                 /tmp/spark_graft_sf10_events)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from bench import _materialize
    from sap_cta_data_pipeline_spark.functions.jsonlane import (
        json_field_arrow,
    )
    from sap_cta_data_pipeline_spark.registry import ORACLES, QUERIES
    from sap_cta_data_pipeline_spark.session import get_spark

    from pyspark.sql import functions as F

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1",
        "/tmp/spark_graft_sf10_events",
    ]
    spark = get_spark("json-rung")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))

    def lane(sf_dir: str, k_expr):
        e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        k = k_expr()
        return (
            e.withColumn("k_bucket", F.floor(k / 10).cast("long"))
            .groupBy("k_bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 6).alias("avg_value"),
                F.countDistinct("user_id").alias("n_users"),
            )
        )

    out = {}
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
        )
        res = {}
        duck = []
        for i in range(4):
            t0 = time.perf_counter()
            con.execute(ORACLES["json_extract_typed"]).fetchall()
            if i:
                duck.append(time.perf_counter() - t0)
        d = statistics.median(duck)
        res["duckdb_s"] = round(d, 3)
        lanes = (
            ("from_json", lambda: lane(
                sf_dir, lambda: F.from_json("props", "k long")["k"])),
            ("arrow", lambda: lane(
                sf_dir, lambda: json_field_arrow("props", "k"))),
        )
        for lane_name, fn in lanes:
            times = []
            for i in range(4):
                t0 = time.perf_counter()
                _materialize(fn())
                if i:
                    times.append(time.perf_counter() - t0)
            s = statistics.median(times)
            res[lane_name] = {"spark_s": round(s, 3), "ratio": round(s / d, 2)}
            print(f"{tag} {lane_name}: {res[lane_name]}", file=sys.stderr, flush=True)
        # value parity between the two Spark lanes (exact rollup match)
        a = sorted(map(tuple, lanes[0][1]().collect()))
        b = sorted(map(tuple, lanes[1][1]().collect()))
        res["lanes_equal"] = a == b
        print(f"{tag} lanes_equal={res['lanes_equal']}", file=sys.stderr)
        con.close()
        out[tag] = res
    print(json.dumps({"json_rung": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
