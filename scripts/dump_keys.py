"""Dump selected query results to CSV for old-vs-new comparison.

Usage: python scripts/dump_keys.py OUT_DIR SF_DIR key1 key2 ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sap_cta_data_pipeline_spark.operators  # noqa: E402,F401  (registry population)
from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402
from sap_cta_data_pipeline_spark.registry import QUERIES  # noqa: E402


def main() -> None:
    out_dir, sf_dir, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-keys")
    for key in keys:
        pdf = QUERIES[key](spark, sf_dir).toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        pdf.to_csv(os.path.join(out_dir, f"{key}.csv"), index=False)
        print(key, len(pdf))


if __name__ == "__main__":
    main()
