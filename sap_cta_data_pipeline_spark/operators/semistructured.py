"""§2-I Array / map / JSON operators.

Array math stays JVM-side via higher-order functions (transform/aggregate)
— no Python boundary, no UDF. Array- and map-typed cells are never emitted
in oracled outputs (not hash-comparable across engines): results are
reduced to scalars, exploded to rows, or canonicalized to strings
(SURVEY.md §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.jsonlane import json_field_arrow
from ..functions.parity import bi, r2, r6
from ..registry import query


@query(
    "json_extract_typed",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
      count(*)                                                AS n,
      round(avg(value), 6)                                    AS avg_value,
      count(DISTINCT user_id)                                 AS n_users
    FROM events
    GROUP BY 1
    """,
)
def json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction with typing, then a bucketed rollup.
    Extraction is the Arrow-native parse lane (functions/jsonlane.py):
    a scalar pandas UDF joins each Arrow batch into one NDJSON buffer
    and parses it with pyarrow's C++ JSON reader — the per-row cost is
    vectorized C++ work, not a JVM Jackson object tree. Lane history:
    round-3 A/B at 1M rows picked from_json 1.19s over
    try_variant_get(parse_json) 1.23s / get_json_object 1.32s / a
    regexp skim 0.60s (regexp rejected: silently misreads nested
    objects and quoted text); from_json then held the one NON-falling
    ratio letter across three rounds (21.7x sf0.1 / 22.6x sf1 / 17.5x
    sf10 — the JVM-parse floor). Round-12 A/B (scripts/json_rung.py,
    canonical idle-box run, warm, median-of-3): this lane cuts the wall
    1.3-2.7x at every scale (0.769/0.920/1.334/4.253 s vs from_json's
    0.977/2.499/2.824/7.404 s at sf0.1/1/10/30) and the ratio FALLS
    with scale — 27.3x -> 11.7x -> 11.5x -> 1.05x at sf30, where
    DuckDB's count-DISTINCT working set leaves cache and its SIMD-parse
    edge stops dominating — so it ships per the round-11 decision
    protocol. Corrupt rows take a per-batch lenient fallback matching
    from_json's null-on-bad-row semantics (tests/test_jsonlane.py)."""
    e = t(spark, sf_dir, "events")
    k = json_field_arrow("props", "k")
    return (
        e.withColumn("k_bucket", F.floor(k / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("value")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "json_shred_materialized",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
      count(*)                                                AS n,
      round(avg(value), 6)                                    AS avg_value,
      count(DISTINCT user_id)                                 AS n_users
    FROM events
    GROUP BY 1
    """,
)
def json_shred_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-shredding fix for json_extract_typed's one genuine
    throughput gap (sf1 ratio ~22× vs DuckDB's SIMD JSON): parse
    ``events.props`` ONCE with from_json, persist the typed column(s)
    alongside the hot scalar columns as parquet, and answer the bucketed
    rollup FROM THE MATERIALIZED COLUMN — repeated queries never re-pay
    the JSON parse (columnar typed reads + min/max pruning instead).
    The materialization is idempotent per (process, sf): a _SUCCESS
    marker skips the parse on re-run, so bench's min-of-2 measures the
    steady state (query-from-shredded) while run 1 carries the one-time
    parse+write — exactly the cost split a production table would have.
    At 100 TB this is the Variant/shredded-column pattern every lakehouse
    JSON story converges on: shred on ingest, query typed columns."""
    import os

    from .sources import _scratch

    path = _scratch(sf_dir, "events_shredded")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        e = t(spark, sf_dir, "events")
        shredded = e.select(
            "event_id",
            "user_id",
            "value",
            F.from_json("props", "k long")["k"].alias("k"),
        )
        shredded.write.mode("overwrite").parquet(path)
    s = spark.read.parquet(path)
    return (
        s.withColumn("k_bucket", F.floor(F.col("k") / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("value")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "json_variant_materialized",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
      count(*)                                                AS n,
      round(avg(value), 6)                                    AS avg_value,
      count(DISTINCT user_id)                                 AS n_users
    FROM events
    GROUP BY 1
    """,
)
def json_variant_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native-VARIANT parse-once lane (round-10 verdict ask #2):
    ``parse_json(props)`` ONCE at ingest into a real ``variant`` column
    persisted in parquet (Spark 4 writes the binary variant encoding —
    metadata+value — natively), then answer json_extract_typed's exact
    bucketed rollup with ``variant_get`` on the STORED column. Unlike
    json_shred_materialized (which commits to one extracted schema at
    write time), the variant lane keeps the FULL semi-structured value
    queryable — any future path costs a binary-variant traversal, not a
    JSON re-parse, which is the schema-flexibility-vs-speed trade the
    open lakehouse VARIANT spec exists for. Same idempotent _SUCCESS-marker
    materialization as the shred lane, so bench's warm runs measure the
    query-from-variant steady state while run 1 carries the one-time
    parse+write.

    Measured A/B (scripts/variant_rung.py, BASELINE.md round-10, warm
    min-of-3): sf0.1 variant 0.351 s ~= shred 0.375 s (within noise);
    sf1-sparse shred 0.436 s < variant 0.503 s (the binary-variant
    traversal per row costs more than a plain columnar long read once
    data dominates job floor); both lanes are 2-3x ahead of the
    parse-per-query lane (0.712 / 1.270 s). Shred stays the headline
    hot-path form; variant is the right call when the path set is
    open-ended."""
    import os

    from .sources import _scratch

    path = _scratch(sf_dir, "events_variant")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        e = t(spark, sf_dir, "events")
        e.select(
            "event_id",
            "user_id",
            "value",
            F.parse_json("props").alias("props_v"),
        ).write.mode("overwrite").parquet(path)
    s = spark.read.parquet(path)
    k = F.expr("variant_get(props_v, '$.k', 'bigint')")
    return (
        s.withColumn("k_bucket", F.floor(k / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("value")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def discover_json_schema(raw: DataFrame) -> tuple[list[str], dict[str, str]]:
    """Runtime schema discovery over a `doc` JSON-string column.

    1. **discover**: one distributed pass explodes ``json_object_keys``
       and collects the DISTINCT key set — a driver literal bounded by
       schema width, never data size;
    2. **infer**: one aggregate pass counts, per discovered key, bigint /
       double try_cast failures PLUS raw JSON-string tokens; narrowest
       type that never fails wins (bigint → double → string).
       get_json_object STRIPS JSON string quoting, so a quoted numeric
       (``"123"``) would cast clean and mis-infer as bigint — diverging
       from spark.read.json, which keeps JSON strings as string. The
       quote-preserving variant typeof counts those, and ANY quoted
       occurrence forces ``string`` (matching spark.read.json's
       mixed-type rule).
    """
    keys = sorted(
        r[0]
        for r in raw.select(
            F.explode(F.json_object_keys("doc")).alias("key")
        ).distinct().collect()
    )
    counters = []
    for k in keys:
        sv = F.get_json_object("doc", f"$.{k}")
        counters += [
            F.count(
                F.when(sv.isNotNull() & F.expr(
                    f"try_cast(get_json_object(doc, '$.{k}') AS bigint)"
                ).isNull(), 1)
            ).alias(f"{k}__bigint_fail"),
            F.count(
                F.when(sv.isNotNull() & F.expr(
                    f"try_cast(get_json_object(doc, '$.{k}') AS double)"
                ).isNull(), 1)
            ).alias(f"{k}__double_fail"),
            F.count(
                F.when(
                    F.expr(
                        f"schema_of_variant(variant_get(parse_json(doc), '$.{k}'))"
                    )
                    == F.lit("STRING"),
                    1,
                )
            ).alias(f"{k}__quoted"),
        ]
    stats = raw.agg(*counters).collect()[0].asDict()
    inferred: dict[str, str] = {}
    for k in keys:
        if stats[f"{k}__quoted"] > 0:
            inferred[k] = "string"
        elif stats[f"{k}__bigint_fail"] == 0:
            inferred[k] = "bigint"
        elif stats[f"{k}__double_fail"] == 0:
            inferred[k] = "double"
        else:
            inferred[k] = "string"
    return keys, inferred




@query(
    "json_shred_discover",
    oracle="""
    WITH src AS (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             event_type AS t,
             floor(value * 100) / 100 AS v
      FROM events
    )
    SELECT 'k' AS key, 'bigint' AS inferred_type,
           count(k) AS n_nonnull, count(DISTINCT k) AS n_distinct
    FROM src
    UNION ALL
    SELECT 't', 'string', count(t), count(DISTINCT t) FROM src
    UNION ALL
    SELECT 'v', 'double', count(v), count(DISTINCT v) FROM src
    """,
)
def json_shred_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred-on-ingest with RUNTIME schema discovery — the round-4
    verdict's completion ask: json_shred_materialized shreds one key
    known a priori, but real props columns are open schema. This lane
    ingests a raw JSON feed (a 3-key enrichment of events.props, built
    deterministically so the oracle can rebuild the same values straight
    from the table: k from props, t = event_type, v = floor(value·100)/100)
    with NO schema given, then:

    1. **discover**: one distributed pass explodes ``json_object_keys``
       and collects the DISTINCT key set — a driver literal bounded by
       schema width, never data size (the agg_pivot_dynamic class);
    2. **infer**: one aggregate pass counts, per discovered key,
       non-null values and bigint/double try_cast failures; narrowest
       type that never fails wins (bigint → double → string) — the
       Spark-read-json inference contract, done as one keyed agg;
    3. **shred**: from_json with the DISCOVERED schema parses once and
       the typed columns persist as parquet (idempotent _SUCCESS skip);
    4. **profile**: per-key n_nonnull + exact n_distinct computed FROM
       the shredded store, so the oracle hash certifies the whole
       discover→infer→shred→read-back loop.

    At 100 TB: passes 1–2 are key-width aggregates over a corpus scan
    each (what schema inference costs by definition — Spark's own
    spark.read.json pays the same), pass 3 is the one parse the
    materialization amortizes forever."""
    import os

    from .sources import _scratch

    raw_path = _scratch(sf_dir, "events_json_feed")
    if not os.path.exists(os.path.join(raw_path, "_SUCCESS")):
        e = t(spark, sf_dir, "events")
        feed = e.select(
            "event_id",
            F.to_json(
                F.struct(
                    F.from_json("props", "k long")["k"].alias("k"),
                    F.col("event_type").alias("t"),
                    (F.floor(F.col("value") * 100) / 100).alias("v"),
                )
            ).alias("doc"),
        )
        feed.write.mode("overwrite").parquet(raw_path)
    raw = spark.read.parquet(raw_path)
    keys, inferred = discover_json_schema(raw)

    # 3. shred once with the discovered schema
    schema_str = ", ".join(f"`{k}` {inferred[k]}" for k in keys)
    shred_path = _scratch(sf_dir, "events_json_feed_shredded")
    if not os.path.exists(os.path.join(shred_path, "_SUCCESS")):
        parsed = raw.select(
            "event_id", F.from_json("doc", schema_str).alias("s")
        ).select("event_id", *[F.col(f"s.{k}").alias(k) for k in keys])
        parsed.write.mode("overwrite").parquet(shred_path)
    s = spark.read.parquet(shred_path)

    # 4. per-key profile from the materialized typed columns
    pieces = [
        s.agg(
            F.lit(k).alias("key"),
            F.lit(inferred[k]).alias("inferred_type"),
            F.count(F.col(k)).alias("n_nonnull"),
            F.countDistinct(F.col(k)).alias("n_distinct"),
        )
        for k in keys
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


@query("json_shred_rollup_hll")  # rows-only: HLL estimates are sketch-impl-specific
def json_shred_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL swap for json_shred_materialized's residual wall: the sf10
    floor study showed the shredded rollup's remaining cost is
    count(DISTINCT user_id) (an expand + second shuffle), not JSON. Where
    the consumer tolerates ±2% (dashboards, monitoring — the usual
    consumers of per-bucket uniques), the exact distinct swaps for a
    DataSketches HLL (`hll_sketch_agg`, the agg_hll_mergeable lane's
    machinery composed onto the shredded store): ONE ordinary partial+
    final agg, no expand, and the per-bucket sketches stay mergeable —
    region rollups or day merges union kilobyte sketches with no raw
    re-scan. Accuracy vs the exact lane is pinned (<5% per bucket) in
    tests/test_units_round5.py; rows-only lane (estimates are
    sketch-implementation-specific, no DuckDB twin)."""
    from ..registry import QUERIES as _Q

    # reuse the materialized shred (idempotent build inside)
    _Q["json_shred_materialized"](spark, sf_dir)
    import os

    from .sources import _scratch

    s = spark.read.parquet(_scratch(sf_dir, "events_shredded"))
    return (
        s.withColumn("k_bucket", F.floor(F.col("k") / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("value")).alias("avg_value"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "n_users_approx"
            ),
        )
    )


@query(
    "arr_basics",
    oracle="""
    SELECT
      vec_id,
      CAST(len(embedding) AS BIGINT)                  AS dim,
      CAST(embedding[1] AS DOUBLE)                    AS first_val,
      CAST(embedding[32] AS DOUBLE)                   AS mid_val,
      CAST(embedding[64] AS DOUBLE)                   AS last_val,
      CAST(len(list_slice(embedding, 1, 8)) AS BIGINT) AS slice_len,
      CAST(list_slice(embedding, 1, 8)[3] AS DOUBLE)  AS slice3
    FROM embeddings
    """,
)
def arr_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice on the vector column (1-based positions on
    both engines). float32→double casts are exact, so no rounding needed."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sl = F.slice(emb, 1, 8)
    return e.select(
        "vec_id",
        bi(F.size(emb)).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, 32).cast("double").alias("mid_val"),
        F.element_at(emb, 64).cast("double").alias("last_val"),
        bi(F.size(sl)).alias("slice_len"),
        F.element_at(sl, 3).cast("double").alias("slice3"),
    )


@query(
    "arr_explode_pos",
    oracle="""
    SELECT
      vec_id,
      i                                  AS pos,
      CAST(embedding[i + 1] AS DOUBLE)   AS val
    FROM embeddings, range(0, 4) t(i)
    """,
)
def arr_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-class posexplode (0-based pos), filtered to pos < 4. The filter
    sits directly on the generator output so Catalyst prunes generated rows
    before anything wide happens."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 4)
        .select("vec_id", bi(F.col("pos")).alias("pos"), F.col("val").cast("double").alias("val"))
    )


@query(
    "arr_explode_outer",
    oracle="""
    WITH src AS (
      SELECT vec_id,
             CASE WHEN vec_id % 7 = 0 THEN NULL
                  ELSE list_slice(embedding, 1, 3) END AS arr
      FROM embeddings
    )
    SELECT vec_id, i AS pos, CAST(arr[i + 1] AS DOUBLE) AS val
    FROM src, range(0, 3) t(i)
    WHERE arr IS NOT NULL
    UNION ALL
    SELECT vec_id, NULL AS pos, NULL AS val
    FROM src
    WHERE arr IS NULL
    """,
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving generator (posexplode_outer): rows with a NULL
    array survive with NULL pos/val instead of vanishing — the outer-join
    semantics of explode, essential when the exploded side is optional
    (every 7th vector's array is nulled to exercise it). The oracle
    reproduces it as inner-generate UNION ALL null-rows."""
    e = t(spark, sf_dir, "embeddings")
    arr = F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
        F.slice("embedding", 1, 3)
    )
    return (
        e.select("vec_id", arr.alias("arr"))
        .select("vec_id", F.posexplode_outer("arr").alias("pos", "val"))
        .select("vec_id", bi(F.col("pos")).alias("pos"), F.col("val").cast("double").alias("val"))
    )


@query(
    "arr_hof_norm",
    oracle="""
    SELECT
      vec_id,
      round(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def arr_hof_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm via higher-order functions — transform + aggregate run
    entirely in the JVM per row; this is the pattern all vector ops in §2-J
    build on (no Python UDF in the hot path)."""
    e = t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select("vec_id", r6(F.sqrt(sq_sum)).alias("l2_norm"))


@query(
    "map_from_string",
    oracle="""
    WITH kv AS (
      SELECT p_partkey,
             concat('brand:', p_brand, ',size:', CAST(p_size AS VARCHAR)) AS kv_str
      FROM part
    )
    SELECT
      p_partkey,
      kv_str,
      'brand,size'                                              AS keys_csv,
      split_part(split_part(kv_str, ',', 1), ':', 2)            AS brand_val,
      CAST(split_part(split_part(kv_str, ',', 2), ':', 2) AS BIGINT) AS size_val
    FROM kv
    """,
)
def map_from_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map parse + key/value extraction. MapType itself is not
    hash-comparable cross-engine, so the map is exercised through sorted
    keys (CSV) and typed value lookups; the oracle reproduces the values
    with pure string ops (DuckDB has no str_to_map)."""
    p = t(spark, sf_dir, "part")
    kv_str = F.concat(
        F.lit("brand:"), F.col("p_brand"), F.lit(",size:"), F.col("p_size").cast("string")
    )
    m = F.str_to_map(kv_str, F.lit(","), F.lit(":"))
    return p.select(
        "p_partkey",
        kv_str.alias("kv_str"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        F.element_at(m, F.lit("brand")).alias("brand_val"),
        F.element_at(m, F.lit("size")).cast("long").alias("size_val"),
    )


@query(
    "map_hof_ops",
    oracle="""
    WITH m AS (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) * 2                 AS size2,
             round(p_retailprice * 100, 0) * 2          AS cents2
      FROM part
    )
    SELECT p_partkey,
           CASE WHEN size2 >= 50 AND cents2 >= 50 THEN 'cents,size'
                WHEN cents2 >= 50 THEN 'cents'
                WHEN size2 >= 50 THEN 'size'
                ELSE '' END                              AS keys_csv,
           CASE WHEN size2 >= 50 THEN round(size2, 2) END  AS size_x2,
           CASE WHEN cents2 >= 50 THEN round(cents2, 2) END AS cents_x2
    FROM m
    """,
)
def map_hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end-to-end: build a typed map per row →
    transform_values (double every value) → map_filter (keep values ≥ 50)
    → emit through sorted keys + typed lookups (MapType never appears raw
    in oracled output — SURVEY §5.3; the oracle reproduces the arithmetic
    columnwise since DuckDB maps aren't hash-comparable either). All
    in-row JVM expressions: zero shuffle, codegen-resident."""
    p = t(spark, sf_dir, "part")
    m0 = F.create_map(
        F.lit("size"), F.col("p_size").cast("double"),
        F.lit("cents"), F.round(F.col("p_retailprice") * 100, 0),
    )
    doubled = F.transform_values(m0, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= 50)
    return p.select(
        "p_partkey",
        F.concat_ws(",", F.array_sort(F.map_keys(kept))).alias("keys_csv"),
        r2(F.element_at(kept, F.lit("size"))).alias("size_x2"),
        r2(F.element_at(kept, F.lit("cents"))).alias("cents_x2"),
    )
