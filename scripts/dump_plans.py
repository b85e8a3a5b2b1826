"""Dump .explain("formatted") for selected keys to plans/<tag>/<key>_<suffix>.txt.

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX SF_DIR key1 key2 ...

The round driver cannot run Spark, so the optimization rounds commit these
files as the evidence backing every plan-shape claim in OPTIMIZATION_r*.md
(Exchange counts, join strategies, PushedFilters, Python-eval nodes).
Building a plan executes any bounded driver-side discovery the operator
does (gate counts, probe collects) but not the query itself.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sap_cta_data_pipeline_spark.operators  # noqa: E402,F401  (registry population)
from sap_cta_data_pipeline_spark.registry import QUERIES  # noqa: E402
from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, sf_dir, keys = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(path, file=sys.stderr)


if __name__ == "__main__":
    main()
