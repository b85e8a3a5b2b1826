"""Driver simulation — exercises the __spark_entry__ contract end-to-end
exactly the way the round driver does: a plain (untuned) SparkSession, the
entry() smoke check, then every queries()[k] at sf0.01 compared against
oracle_sql()[k] via DuckDB.

Usage: python scripts/driver_sim.py [sf_dir] [--tz America/New_York]
       [--only substr1,substr2]   (run only keys containing a substring)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sap_cta_data_pipeline_spark.catalog import TABLE_NAMES  # noqa: E402
from tests.differential import frames_match  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    tz = sys.argv[sys.argv.index("--tz") + 1] if "--tz" in sys.argv else None
    only = (
        sys.argv[sys.argv.index("--only") + 1].split(",") if "--only" in sys.argv else None
    )

    # Plain session, as the driver would build it — no engine tuning applied.
    builder = SparkSession.builder.master("local[8]").appName("driver-sim")
    if tz:
        builder = builder.config("spark.sql.session.timeZone", tz)
    spark = builder.getOrCreate()

    print("== entry() smoke ==")
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema: {df.schema.simpleString()}")
    assert len(rows) > 0

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if any(s in k for s in only)}
    print(f"== {len(qs)} queries at {sf_dir} ({len(oracles)} oracled) ==")
    failed = []
    for key in sorted(qs):
        t0 = time.time()
        try:
            actual = qs[key](spark, sf_dir).toPandas()
            if key in oracles:
                expected = con.execute(oracles[key]).fetchdf()
                problems = frames_match(actual, expected)
            else:
                problems = [] if len(actual) >= 0 else ["no result"]
            status = "OK " if not problems else "FAIL"
            if problems:
                failed.append((key, problems))
            print(f"{status} {key:28s} rows={len(actual):6d} {time.time()-t0:5.1f}s")
            for p in problems:
                print(f"     {p}")
        except Exception as exc:  # driver records this as a hard failure
            failed.append((key, [str(exc)[:500]]))
            print(f"ERR  {key:28s} {type(exc).__name__}: {str(exc)[:200]}")
    print(f"== done: {len(qs) - len(failed)}/{len(qs)} matched ==")
    for key, problems in failed:  # re-list failures AFTER the summary so a
        # tail of the log always carries the names + first diffs
        print(f"== FAILED {key}: {problems[:3]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
