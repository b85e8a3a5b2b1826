"""§2 round-9 batch FP — the VARIANT semi-structured type (Spark 4
engine surface).

``sql_variant_get_typed``: the open-format VARIANT path — parse once
into the binary variant encoding, extract TYPED fields by path
(`try_variant_get` with nested-object and array-index paths), aggregate
from the extractions, and pin `schema_of_variant`'s inferred shape
literally. VARIANT is the engine's answer to shred-vs-string JSON
(columnar binary, typed access without a declared schema); next to the
json_extract_typed / json_shred family this exercises the THIRD route
a semi-structured pipeline can take.

``sql_variant_explode``: the `variant_explode` LATERAL table function
over a variant ARRAY — per-element (pos, typed value) rows feeding a
normal aggregation; the TVF is the variant twin of posexplode and the
idiomatic way to unnest variant arrays without casting to a declared
array type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

@query(
    "sql_variant_get_typed",
    oracle="""
    WITH x AS (
      SELECT event_type, user_id,
             CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    j AS (
      SELECT '{"meta":{"t":"' || event_type || '","u":' || user_id
               || '},"vals":[' || c || ',' || c * 2 || ']}' AS js
      FROM x
    ),
    got AS (
      SELECT js->>'$.meta.t' AS typ,
             CAST(js->>'$.meta.u' AS BIGINT) AS u,
             CAST(js->'$.vals[1]' AS BIGINT) AS v2
      FROM j
    )
    SELECT typ AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(u) AS BIGINT) AS sum_u,
           CAST(sum(v2) AS BIGINT) AS sum_v2,
           'OBJECT<meta: OBJECT<t: STRING, u: BIGINT>, vals: ARRAY<BIGINT>>'
             AS variant_schema
    FROM got GROUP BY typ
    """,
)
def sql_variant_get_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed path extraction from VARIANT: synthesize a nested JSON per
    event (object + array, deterministic from columns), `parse_json`
    into the binary variant encoding, pull `$.meta.t` (string),
    `$.meta.u` (bigint), `$.vals[1]` (bigint array index) with
    try_variant_get, and aggregate per type — plus the literal
    `schema_of_variant` pin proving the encoder typed the fields
    (STRING/BIGINT/ARRAY<BIGINT>), which the DuckDB oracle mirrors with
    JSON-path extraction. Extraction is expression-level (whole-stage
    codegen), no UDF.

    Scale: one scan, one hash agg — VARIANT's point is that typed
    access costs an expression, not a shred job; the shred-on-ingest
    family (json_shred_*) remains the answer when the SAME paths are
    read repeatedly."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = e.select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    j = F.concat(
        F.lit('{"meta":{"t":"'),
        F.col("event_type"),
        F.lit('","u":'),
        F.col("user_id"),
        F.lit('},"vals":['),
        F.col("c"),
        F.lit(","),
        F.col("c") * 2,
        F.lit("]}"),
    )
    v = F.parse_json(j)
    got = x.select(
        F.try_variant_get(v, "$.meta.t", "string").alias("typ"),
        F.try_variant_get(v, "$.meta.u", "bigint").alias("u"),
        F.try_variant_get(v, "$.vals[1]", "bigint").alias("v2"),
        F.schema_of_variant(v).alias("sch"),
    )
    return got.groupBy("typ").agg(
        bi(F.count(F.lit(1))).alias("n"),
        bi(F.sum("u")).alias("sum_u"),
        bi(F.sum("v2")).alias("sum_v2"),
        F.any_value(F.col("sch")).alias("variant_schema"),
    ).select(
        F.col("typ").alias("event_type"),
        "n",
        "sum_u",
        "sum_v2",
        "variant_schema",
    )


@query(
    "sql_variant_explode",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    ex AS (
      SELECT event_type, u.pos AS pos,
             CASE u.pos WHEN 0 THEN c WHEN 1 THEN c * 2
                        ELSE c % 10 END AS val
      FROM x, (VALUES (0), (1), (2)) AS u(pos)
    )
    SELECT event_type, CAST(pos AS INT) AS pos,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS sum_val
    FROM ex GROUP BY event_type, pos
    """,
)
def sql_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`variant_explode` LATERAL TVF over a variant array
    [c, 2c, c mod 10]: per-element (pos, value) rows — the variant twin
    of posexplode, with the element CAST back to bigint at use site —
    aggregated per (type, pos). The oracle unrolls the same three
    positions relationally.

    Scale: the TVF is row-local (no shuffle); the agg is one hash
    exchange — identical envelope to arr_explode_pos."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    ).createOrReplaceTempView("__variant_src")
    return spark.sql(
        """
        SELECT event_type, CAST(v.pos AS INT) AS pos,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(v.value AS BIGINT)) AS BIGINT) AS sum_val
        FROM __variant_src,
        LATERAL variant_explode(
          parse_json('[' || c || ',' || c * 2 || ',' || c % 10 || ']')
        ) AS v
        GROUP BY event_type, v.pos
        """
    )
