#!/usr/bin/env python
"""Text/embedding-lane ratio-vs-scale rung (round-10 verdict ask #6):
the relational floor arc is complete (pricing 16.4x at sf0.1 -> 2.1x at
sf100), but the TEXT letters — text_lang_id (9-11x), text_tfidf_topk
(6.6-7.5x), json_shred_materialized (~10x) — and the embedding lanes
(sim_knn 9-12x, emb_centroid 18-23x) were never priced past sf1. This
rung records the ratio-vs-scale series one decade further: any letter
NOT falling with scale is a real plan item, not a job floor.

Corpus shape: the sf10 text dir is the DUP-SPARSE synthesis
(make_sf_scaled.py --dup-sparse --tables=documents,embeddings, rep=100)
so dup density stays constant as volume grows — the realistic corpus
shape the round-5 study established; relational/events tables symlink
from the dup-dense sf10 dir (identical in both modes).

dedup_minhash_cluster has no SQL oracle (hash-specific) — its wall is
recorded wall-only for the scaling trend.

Usage: python scripts/text_rung.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1_sparse
                 /tmp/spark_graft_sf10_text)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "text_lang_id",
    "text_tfidf_topk",
    "json_shred_materialized",
    "json_extract_typed",
    "dedup_near_embedding",
    "sim_knn_cosine",
    "emb_centroid_by_label",
]
WALL_ONLY = ["dedup_minhash_cluster"]
#: per-(dir-tag, key) oracle skips: DuckDB's brute-force O(n^2) pair
#: join for near-dup cosine is ~27 s at sf1 and ~quadratic in rows — at
#: sf10 the oracle alone would run hours, measuring DuckDB's lack of an
#: LSH plan, not ours. Record the Spark wall; the ratio story is already
#: decided at sf1 (0.04x — the bucketed plan wins by 25x there and the
#: gap widens quadratically).
ORACLE_SKIP = {("spark_graft_sf10_text", "dedup_near_embedding")}


def main() -> int:
    import duckdb

    from bench import _materialize
    from sap_cta_data_pipeline_spark.catalog import TABLE_NAMES
    from sap_cta_data_pipeline_spark.registry import ORACLES, QUERIES
    from sap_cta_data_pipeline_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1_sparse",
        "/tmp/spark_graft_sf10_text",
    ]
    spark = get_spark("text-rung")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))

    out = {}
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        con = duckdb.connect()
        for name in TABLE_NAMES:
            p = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
                )
        res = {}
        for key in KEYS + WALL_ONLY:
            oracled = (
                key in ORACLES
                and key not in WALL_ONLY
                and (tag, key) not in ORACLE_SKIP
            )
            duck_times, spark_times = [], []
            try:
                if oracled:
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
            except Exception as ex:  # noqa: BLE001 — record, keep rung going
                res[key] = {"error": str(ex)[:200]}
                print(f"{tag} {key}: ERROR {ex}", file=sys.stderr)
                continue
            s = statistics.median(spark_times)
            row = {"spark_s": round(s, 3)}
            if duck_times:
                d = statistics.median(duck_times)
                row.update({"duckdb_s": round(d, 3), "ratio": round(s / d, 2)})
            res[key] = row
            print(f"{tag} {key}: {row}", file=sys.stderr, flush=True)
        con.close()
        out[tag] = res
    print(json.dumps({"text_rung": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
