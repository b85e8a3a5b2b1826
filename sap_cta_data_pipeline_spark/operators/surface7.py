"""§2 round-3 addendum Z — source/sink hardening, SQL-dialect clauses,
datetime formatting, and embedding-truncation evaluation.

- sink_parquet_bloomfilter — parquet written WITH a column bloom
  filter + the equality-probe read-back: at 100 TB, bloom filters prune
  row groups for selective point predicates that min/max stats can't
  (high-cardinality unsorted keys) — the write-side knob is the
  operator; values are oracled unchanged.
- source_csv_gzip_roundtrip — gzip-compressed CSV ingestion: correct
  values, and the scale note that gzip is NOT splittable (one task per
  file) — the classic ingest trap; the fix at scale is many medium
  files or a splittable codec at the edge.
- fn_date_format — date→string formatting surface over the pattern
  subset both engines define identically (year/month/day/quarter
  pieces composed explicitly, not locale-dependent names).
- sql_filter_clause — the SQL-standard FILTER (WHERE …) aggregate
  modifier (agg_conditional covers the CASE form; this is the dialect
  clause migrated SQL actually contains).
- sql_natural_join — NATURAL JOIN / USING resolution surface: key
  deduplication in the output schema, planned as the same equi hash
  join as the explicit ON form.
- emb_prefix_dim_eval — Matryoshka-style truncation evaluation: does
  the 16-dim PREFIX of each embedding rank the same top-1 neighbor as
  the full 64 dims? Broadcast probes × one corpus scan, exact cosine
  at both widths, per-probe agreement — the eval that decides whether
  a cheap prefix index is safe to ship.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t, register_views
from ..functions.parity import bi, r6
from ..registry import query
from .sources import _scratch


@query(
    "sink_parquet_bloomfilter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_partkey = (SELECT min(l_partkey) FROM lineitem)
    """,
)
def sink_parquet_bloomfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem's probe columns to parquet WITH a bloom filter on
    l_partkey, then point-probe it. Min/max row-group stats cannot prune
    an equality probe on a high-cardinality UNSORTED key (every row
    group spans most of the key range); a bloom filter gives each row
    group a probabilistic membership test, so selective point reads
    skip row groups that provably lack the key. The write-side options
    are the operator; the oracle certifies probe values are unchanged.
    At 100 TB this is the cheap alternative to full re-clustering for
    secondary point-lookup keys."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = _scratch(sf_dir, "lineitem_bloom")
    (
        li.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_partkey", "200000")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    probe = li.agg(F.min("l_partkey").alias("k"))
    return back.join(F.broadcast(probe), back["l_partkey"] == F.col("k")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


@query(
    "source_csv_gzip_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip nation through gzip-compressed CSV. Values are
    byte-identical to the source; the SCALE note is the point: gzip is
    a NON-SPLITTABLE codec, so each .csv.gz file is exactly one task
    regardless of size — a single 100 GB gzip file serializes the whole
    scan. The production shapes are many ~128 MB files (parallelism =
    file count) or a splittable codec/format at the ingest edge."""
    path = _scratch(sf_dir, "nation_csv_gz")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n.write.mode("overwrite").option("header", "true").option(
        "compression", "gzip"
    ).csv(path)
    return (
        spark.read.option("header", "true")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(path)
    )


@query(
    "fn_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                       AS iso_day,
           strftime(o_orderdate, '%Y/%m')                          AS year_month,
           CAST(year(o_orderdate) AS BIGINT) * 100
             + CAST(quarter(o_orderdate) AS BIGINT)                AS yyyyq,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')              AS iso_ts
    FROM orders
    """,
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime→string formatting over the pattern subset both engines
    define identically: zero-padded numeric fields composed explicitly
    (locale-dependent month/day NAMES are deliberately excluded — they
    are the classic cross-engine formatting trap). Pure projection."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.date_format(d, "yyyy/MM").alias("year_month"),
        (F.year(d).cast("long") * 100 + F.quarter(d).cast("long")).alias("yyyyq"),
        F.date_format(d, "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
    )


@query(
    "sql_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) >= 1998), 2)
             AS late_revenue,
           round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6)
             AS avg_open_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard FILTER (WHERE …) aggregate modifier — the
    dialect form of conditional aggregation (agg_conditional pins the
    CASE-expression twin). Catalyst rewrites FILTER into the same
    partial+final hash agg with guarded update expressions; declared in
    SQL so the parser surface itself is exercised."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS n_finished,
               round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) >= 1998), 2)
                 AS late_revenue,
               round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6)
                 AS avg_open_price
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "sql_natural_join",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def sql_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN resolution surface: nation⋈region joined on their
    shared column NAME (n_regionkey — after aliasing customer's key to
    match nation's), with the join column deduplicated in the output
    schema. Resolved at analysis time to the identical broadcast equi
    hash join as the explicit ON form — a parser/analyzer surface, not
    a new physical strategy."""
    register_views(spark, sf_dir, ("customer", "nation", "region"))
    return spark.sql(
        """
        SELECT n_name, r_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM (SELECT c_custkey, c_nationkey AS n_nationkey FROM customer)
        NATURAL JOIN nation
        NATURAL JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region)
        GROUP BY n_name, r_name
        """
    )


_PREFIX_DIMS = 16


@query(
    "emb_prefix_dim_eval",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), probes AS (
      SELECT * FROM v WHERE vec_id % 97 = 0
    ), scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             list_sum(list_transform(range(1, 65), i -> p.e[i] * c.e[i]))
               / (sqrt(list_sum(list_transform(p.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos_full,
             list_sum(list_transform(range(1, {_PREFIX_DIMS + 1}, 1), i -> p.e[i] * c.e[i]))
               / (sqrt(list_sum(list_transform(p.e[1:{_PREFIX_DIMS}], x -> x * x)))
                  * sqrt(list_sum(list_transform(c.e[1:{_PREFIX_DIMS}], x -> x * x)))) AS cos_pre
      FROM probes p JOIN v c ON c.vec_id != p.vec_id
    ), best AS (
      SELECT probe_id,
             max(CASE WHEN rf = 1 THEN cand_id END) AS top_full,
             max(CASE WHEN rp = 1 THEN cand_id END) AS top_prefix
      FROM (
        SELECT probe_id, cand_id,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY cos_full DESC, cand_id ASC) AS rf,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY cos_pre DESC, cand_id ASC) AS rp
        FROM scored
      )
      GROUP BY probe_id
    )
    SELECT probe_id, top_full, top_prefix,
           (top_full = top_prefix) AS agree
    FROM best
    """,
)
def emb_prefix_dim_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: for each probe (every
    97th vector), the exact-cosine top-1 neighbor using the FULL 64
    dims vs using only the first 16 — per-probe agreement tells you
    whether a cheap prefix index preserves ranking before you ship it.
    Broadcast probes × one corpus scan (the sim_knn_cosine shape), both
    widths scored in the same pass; ties broken toward the smaller
    candidate id on both engines."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    probes = v.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    pairs = v.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))

    def cos(a: str, b: str, dims: int | None):
        ea = F.col(a) if dims is None else F.slice(F.col(a), 1, dims)
        eb = F.col(b) if dims is None else F.slice(F.col(b), 1, dims)
        dot = F.aggregate(
            F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        na = F.sqrt(F.aggregate(F.transform(ea, lambda x: x * x), F.lit(0.0), lambda a2, x: a2 + x))
        nb = F.sqrt(F.aggregate(F.transform(eb, lambda x: x * x), F.lit(0.0), lambda a2, x: a2 + x))
        return dot / (na * nb)

    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("cand_id"),
        cos("pe", "e", None).alias("cos_full"),
        cos("pe", "e", _PREFIX_DIMS).alias("cos_pre"),
    )
    neg_id = (-F.col("cand_id")).cast("double")
    best = scored.groupBy("probe_id").agg(
        F.max_by("cand_id", F.array(F.col("cos_full"), neg_id)).alias("top_full"),
        F.max_by("cand_id", F.array(F.col("cos_pre"), neg_id)).alias("top_prefix"),
    )
    return best.select(
        "probe_id",
        "top_full",
        "top_prefix",
        (F.col("top_full") == F.col("top_prefix")).alias("agree"),
    )
