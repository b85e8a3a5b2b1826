#!/usr/bin/env python
"""sf30 ladder rung (round-4 verdict ask #7, round-6 completion): measure
the floor-letter lanes against DuckDB on the 300×-replicated relational
tables (180M-row lineitem, /tmp/spark_graft_sf30 via make_sf_scaled.py
--tables=...). Spark = min of 2 after a warm-up job; DuckDB = median of 3.
Usage: python scripts/sf30_rung.py [sf30_dir] [key ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["agg_pricing_summary", "agg_rollup", "join_multiway"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf30"
    keys = sys.argv[2:] or KEYS

    import duckdb

    import sap_cta_data_pipeline_spark.operators  # noqa: F401
    from sap_cta_data_pipeline_spark.registry import ORACLES, QUERIES
    from sap_cta_data_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.range(10).count()  # JVM warm

    con = duckdb.connect()
    for tbl in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    out = {}
    for k in keys:
        walls = []
        for _ in range(2):
            t0 = time.time()
            QUERIES[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        dd = []
        for _ in range(3):
            t0 = time.time()
            con.execute(ORACLES[k]).fetchall()
            dd.append(time.time() - t0)
        out[k] = {
            "spark_s": round(min(walls), 3),
            "duckdb_s": round(statistics.median(dd), 3),
            "ratio": round(min(walls) / statistics.median(dd), 1),
        }
        print(k, out[k], flush=True)
    print(json.dumps({"sf": 30, "rung": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
