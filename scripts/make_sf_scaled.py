#!/usr/bin/env python
"""Synthesize a ~REP× scaled copy of a testdata sf directory (default:
sf0.1 × 10 ≈ sf1) by replication with re-keying, for the ratio-vs-scale
bench (BASELINE.md round-3 section).

Replication semantics (what "10× the data" means here):
- facts (orders/lineitem/events) replicate with per-replica key offsets
  so orderkey/custkey/partkey/suppkey/user_id joins stay consistent and
  key cardinality scales with volume;
- keyed dims (customer/supplier/part) replicate with the same offsets;
  bounded real-world dims (region/nation) stay as-is, so fact→nation
  joins fan in exactly like a real 10× volume growth;
- documents get a per-replica suffix token so DISTINCT content scales
  10× (otherwise the dedup lanes would collapse all replicas in their
  first fingerprint groupBy and measure nothing);
- embeddings get a deterministic per-(vec_id, dim, replica) direction
  perturbation (pure column arithmetic, no RNG) so vectors are distinct
  across replicas while preserving the label-block structure.

--dup-sparse (round-5 verdict ask #6): the default replication is
maximally DUP-DENSE for near-dup lanes — a one-token suffix keeps every
replica within Jaccard ~0.9 of its siblings, so each source doc becomes a
rep-member near-dup family and pair output grows quadratically in rep.
That conflates output-bound cost with plan cost. --dup-sparse instead
suffixes EVERY token with the replica id for r > 0: cross-replica shingle
overlap drops to zero (replicas are NOT near-dups of each other) while
within-replica duplicate structure is exactly the base corpus's (two
identical base docs stay identical under the same transformation) — dup
DENSITY stays constant as volume scales, the realistic web-corpus shape.
Only documents differ between modes.

Pure DuckDB; deterministic; writes <out_dir>/<table>.parquet and a
_COMPLETE marker (checked by bench.py — a crashed partial run without the
marker is re-synthesized, never silently benched).
Usage: python scripts/make_sf_scaled.py [src_sf_dir] [out_dir] [rep] [--dup-sparse]
"""

from __future__ import annotations

import os
import sys

import duckdb

# key offsets far above any base-key range at sf0.1
OFF = 100_000_000


def main() -> int:
    only: set[str] | None = None
    argv = []
    dup_sparse = False
    skew_hot = False
    for a in sys.argv[1:]:
        if a == "--dup-sparse":
            dup_sparse = True
        elif a == "--skew-hot":
            # round-10 verdict ask #1: adversarial Zipf-hot-key variant —
            # ~30% of ALL lineitem rows collapse onto ONE orderkey (key 1,
            # which replica 0 keeps in orders), the real-cluster join
            # killer. Selection is a deterministic multiplicative hash of
            # the pre-offset row identity, so the hot set is reproducible
            # and spread uniformly across replicas. Only lineitem changes.
            skew_hot = True
        elif a.startswith("--tables="):
            # partial synthesis for big-rep ladder runs (e.g. rep=300
            # relational-only — documents/embeddings stay at a lower rung)
            only = set(a.split("=", 1)[1].split(","))
        else:
            argv.append(a)
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else "/tmp/spark_graft_sf1"
    rep = int(argv[2]) if len(argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        os.remove(marker)
    con = duckdb.connect()
    con.execute(f"CREATE MACRO src(t) AS '{src}/' || t || '.parquet'")

    def copy(name: str, select: str) -> None:
        if only is not None and name not in only:
            return
        con.execute(
            f"COPY ({select}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

    # bounded dims: unchanged
    for dim in ("region", "nation"):
        copy(dim, f"SELECT * FROM read_parquet(src('{dim}'))")

    rep_src = f"(SELECT range AS r FROM range({rep}))"

    copy(
        "customer",
        f"""SELECT c_custkey + r * {OFF} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM read_parquet(src('customer')), {rep_src}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + r * {OFF} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM read_parquet(src('supplier')), {rep_src}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + r * {OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM read_parquet(src('part')), {rep_src}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + r * {OFF} AS o_orderkey,
                   o_custkey + r * {OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet(src('orders')), {rep_src}""",
    )
    if skew_hot:
        # hot-key membership: ~30% of rows by multiplicative hash of the
        # pre-offset (orderkey, linenumber, replica) identity → orderkey 1
        lkey = (
            "CASE WHEN ((l_orderkey * 2654435761 + l_linenumber * 97 + r)"
            " % 10) < 3 THEN 1"
            f" ELSE l_orderkey + r * {OFF} END AS l_orderkey"
        )
    else:
        lkey = f"l_orderkey + r * {OFF} AS l_orderkey"
    copy(
        "lineitem",
        f"""SELECT {lkey},
                   l_partkey + r * {OFF} AS l_partkey,
                   l_suppkey + r * {OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet(src('lineitem')), {rep_src}""",
    )
    copy(
        "events",
        f"""SELECT event_id + r * {OFF} AS event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   user_id + r * {OFF} AS user_id,
                   event_type, value, props
            FROM read_parquet(src('events')), {rep_src}""",
    )
    if dup_sparse:
        # every token carries the replica id → zero cross-replica shingle
        # overlap (replicas are unrelated docs), base dup structure intact
        doc_text = (
            "CASE WHEN r = 0 THEN text ELSE array_to_string("
            "list_transform(string_split(text, ' '), w -> w || 'r' || r), ' ') END"
        )
    else:
        doc_text = "CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END"
    copy(
        "documents",
        f"""SELECT doc_id + r * {OFF} AS doc_id,
                   {doc_text} AS text,
                   lang, source,
                   length({doc_text}) AS n_chars
            FROM read_parquet(src('documents')), {rep_src}""",
    )
    copy(
        "embeddings",
        f"""SELECT vec_id + r * {OFF} AS vec_id,
                   CASE WHEN r = 0 THEN embedding ELSE
                     list_transform(range(1, 65), j -> CAST(
                       embedding[j]
                       + ((CAST((vec_id * 31 + j * 7 + r * 13) % 17 AS DOUBLE) - 8)
                          * 0.002)
                     AS FLOAT)) END AS embedding,
                   label
            FROM read_parquet(src('embeddings')), {rep_src}""",
    )
    with open(marker, "w") as fh:
        mode = "dup-sparse" if dup_sparse else "dup-dense"
        if skew_hot:
            mode += " skew-hot"
        if only is not None:
            mode += " tables=" + ",".join(sorted(only))
        fh.write(f"rep={rep} mode={mode}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
