"""§2 round-2 addendum T — Spark 4.x type & SQL-surface parity.

Four surfaces a reference user migrating real SQL would reach for, each
new in (or re-landed for) Spark 4.x:

- json_variant_shred — the VARIANT type (parse once, extract typed):
  ``parse_json`` shreds the per-event JSON string into Spark's binary
  variant encoding, ``variant_get``/``try_variant_get`` extract typed
  paths with no re-parse. This is the 100 TB JSON story: one parse per
  row per stage instead of one parse per ``get_json_object`` call
  (json_extract_typed documents the string-path alternative).
- sql_group_by_all — GROUP BY ALL / ORDER BY ALL resolution: every
  non-aggregate select item becomes a grouping key. Resolved entirely at
  analysis time — the physical plan is identical to the explicit form
  (partial+final hash agg), so this is a pure front-end parity surface.
- fn_collation_group — Spark 4 string collations: grouping under
  ``UTF8_LCASE`` merges case-variant keys inside the hash aggregate
  itself (collation-aware grouping keys), where the classic workaround
  pre-normalizes with ``lower()``. Same shuffle shape either way; the
  collated form preserves the original strings for downstream use.
- agg_listagg_ordered — SQL-standard ``listagg(x, sep) WITHIN GROUP
  (ORDER BY …)`` (new in Spark 4.0). Semantically the string twin of
  agg_collect_sorted's array form; the WITHIN GROUP ordering makes the
  concatenation deterministic, which is what makes it oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t, register_views
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "json_variant_shred",
    oracle="""
    WITH shred AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             json_extract_string(props, '$.missing')           AS missing
      FROM events
    )
    SELECT event_type,
           count(*)                                        AS n,
           round(avg(k), 6)                                AS avg_k,
           max(k)                                          AS max_k,
           CAST(sum(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM shred
    WHERE k >= 10
    GROUP BY event_type
    """,
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT shredding: ``parse_json(props)`` once per row, then typed
    ``variant_get`` path extraction (``$.k`` as long) and a
    ``try_variant_get`` miss (``$.missing`` → NULL, never an error), a
    predicate on the extracted value, and a keyed rollup. The variant
    column is parsed exactly once however many paths are pulled from it —
    at 100 TB that single-parse property (plus columnar shredding of
    variant in parquet) is why this beats per-path get_json_object."""
    e = t(spark, sf_dir, "events")
    # project the parsed variant ONCE, then extract paths from that column —
    # the single-parse property is structural, not left to Catalyst CSE
    shred = e.withColumn("v", F.parse_json("props")).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'string')").alias("missing"),
    )
    return (
        shred.filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
            bi(F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))).alias("n_missing"),
        )
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           o_orderstatus,
           count(*)                          AS n_orders,
           round(sum(o_totalprice), 2)       AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL: grouping keys inferred from the
    non-aggregate select items at analysis time. The optimized plan is
    byte-identical to the explicit GROUP BY 1,2 form — partial+final hash
    aggregate on (year, status), one shuffle — so the surface costs
    nothing; it exists so migrated DuckDB/Snowflake-dialect SQL runs
    unchanged."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               o_orderstatus,
               count(*)                          AS n_orders,
               round(sum(o_totalprice), 2)       AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "fn_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE lower(p_type) END AS ptype
      FROM part
    )
    SELECT lower(min(ptype))         AS ptype_ci,
           count(*)                  AS n,
           count(DISTINCT ptype)     AS n_case_variants
    FROM mixed
    GROUP BY lower(ptype)
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: the key is
    ``ptype COLLATE UTF8_LCASE``, so 'ECONOMY BRUSHED' and 'economy
    brushed' (synthesized by alternating case on partkey parity) land in
    the same hash-agg group without pre-normalization. The emitted key is
    canonicalized ``lower(min(ptype))`` — min over the raw (binary-order)
    strings — because the collated group's representative value is
    otherwise first-encountered/nondeterministic. Plan reality (pinned in
    tests/test_plans.py): collated grouping keys are not hash-agg-able in
    Spark 4.1, so this plans as SortAggregate over keyed exchanges — at
    100 TB prefer the lower()-prenormalized hash-agg twin in the hot path
    and reserve collation for correctness-critical locale semantics;
    collation keeps originals available (n_case_variants counts them)."""
    p = t(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("ptype")
    )
    return (
        mixed.groupBy(F.expr("ptype COLLATE UTF8_LCASE").alias("_ck"))
        .agg(
            F.lower(F.min("ptype")).alias("ptype_ci"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ptype").alias("n_case_variants"),
        )
        .drop("_ck")
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT r.r_name                                   AS region,
           count(*)                                   AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM nation n
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered string aggregation: ``listagg(n_name, ',')
    WITHIN GROUP (ORDER BY n_name)`` per region (Spark 4.0 surface;
    DuckDB's spelling is string_agg … ORDER BY). The WITHIN GROUP sort is
    what makes concatenation order — and therefore the value hash —
    engine-independent. Array twin: agg_collect_sorted. Plan: broadcast
    region, partial+final agg with a per-group sort of 5-element state."""
    register_views(spark, sf_dir, ("nation", "region"))
    return spark.sql(
        """
        SELECT /*+ BROADCAST(r) */
               r.r_name                                            AS region,
               count(*)                                            AS n_nations,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations_csv
        FROM nation n
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
        """
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           count(*)                                         AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6)                        AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, the |> operator dialect): scan |>
    WHERE |> EXTEND (computed column) |> AGGREGATE … GROUP BY |> ORDER BY.
    Each pipe stage lowers to exactly the relational operator the classic
    form produces — the optimized plan is the same pushed-scan +
    partial/final agg; this key pins that the dialect front-end accepts a
    realistic multi-stage query, not a toy."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS net
        |> AGGREGATE count(*)           AS n,
                     round(sum(net), 2) AS revenue,
                     round(avg(l_quantity), 6) AS avg_qty
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderstatus,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL + SQL session variables (Spark 4 surface): the
    price floor lives in a DECLAREd session variable (set via EXECUTE
    IMMEDIATE), the priority arrives as a named parameter marker
    (:prio) — the two injection-safe ways to template SQL. Both resolve
    at analysis time to literals, so the plan is the constant-folded one
    the oracle runs; no re-compilation per row, no string splicing."""
    register_views(spark, sf_dir, ("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("EXECUTE IMMEDIATE 'SET VARIABLE price_floor = 150000.0'")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*)                    AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_totalprice >= price_floor AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        """,
        args={"prio": "1-URGENT"},
    )
