"""§2-H Scalar functions (string / date / math / conditional).

Everything here is a narrow per-row projection: no shuffle, fully inside
WholeStageCodegen, trivially scale-independent. The interesting part is
cross-engine parity (SURVEY.md §5.3): integer widths (DuckDB scalar fns
lean BIGINT), date_trunc return types (DATE vs TIMESTAMP), months_between
semantics, and floor/sign result types are all normalized explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6, um
from ..registry import query


@query(
    "fn_string_core",
    oracle="""
    SELECT
      c_custkey,
      concat(c_mktsegment, ':', c_name)            AS seg_name,
      substr(c_name, 1, 8)                         AS sub8,
      upper(c_mktsegment)                          AS seg_up,
      lower(c_name)                                AS name_lo,
      trim(concat('  ', c_mktsegment, '  '))       AS seg_trim,
      lpad(CAST(c_custkey AS VARCHAR), 10, '0')    AS key_pad,
      CAST(length(c_name) AS BIGINT)               AS name_len,
      replace(c_name, 'Customer', 'Cust')          AS name_repl,
      split_part(c_name, '#', 2)                   AS key_part,
      left(c_name, 4)                              AS l4,
      right(c_name, 3)                             AS r3
    FROM customer
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.concat(seg, F.lit(":"), name).alias("seg_name"),
        F.substring(name, 1, 8).alias("sub8"),
        F.upper(seg).alias("seg_up"),
        F.lower(name).alias("name_lo"),
        F.trim(F.concat(F.lit("  "), seg, F.lit("  "))).alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        bi(F.length(name)).alias("name_len"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("name_repl"),
        F.element_at(F.split(name, "#"), 2).alias("key_part"),
        F.expr("left(c_name, 4)").alias("l4"),
        F.expr("right(c_name, 3)").alias("r3"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT
      c_custkey,
      regexp_extract(c_name, '([0-9]+)', 1)                    AS digits,
      CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)    AS cust_num,
      regexp_replace(c_mktsegment, '[AEIOU]', '', 'g')         AS seg_novowel,
      CASE WHEN regexp_matches(c_name, '^Customer#0*1?[0-9]$') THEN 1 ELSE 0 END AS is_single_digit
    FROM customer
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE2-safe regex subset only (char classes, anchors, quantifiers) —
    fancy constructs diverge across regex engines. Note DuckDB
    regexp_replace needs the 'g' flag for replace-all parity."""
    c = t(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.regexp_extract(name, r"([0-9]+)", 1).alias("digits"),
        F.regexp_extract(name, r"([0-9]+)", 1).cast("long").alias("cust_num"),
        F.regexp_replace(F.col("c_mktsegment"), "[AEIOU]", "").alias("seg_novowel"),
        F.when(name.rlike(r"^Customer#0*1?[0-9]$"), 1).otherwise(0).alias("is_single_digit"),
    )


@query(
    "fn_date_parts",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS BIGINT)                         AS y,
      CAST(month(o_orderdate) AS BIGINT)                        AS m,
      CAST(day(o_orderdate) AS BIGINT)                          AS d,
      CAST(quarter(o_orderdate) AS BIGINT)                      AS q,
      CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start
    FROM orders
    """,
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction. date_trunc returns TIMESTAMP in Spark but DATE
    in DuckDB → canonicalized through DATE→VARCHAR. dayofweek is avoided
    entirely (Spark 1=Sunday vs DuckDB 0=Sunday)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        bi(F.year(d)).alias("y"),
        bi(F.month(d)).alias("m"),
        bi(F.dayofmonth(d)).alias("d"),
        bi(F.quarter(d)).alias("q"),
        F.date_trunc("month", d).cast("date").cast("string").alias("month_start"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT
      o_orderkey,
      o_orderdate + INTERVAL 90 DAY                                  AS ship_by,
      (2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))     AS months_to_2002,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)           AS eom,
      epoch_us(o_orderdate)                                          AS epoch_us
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic. Month spans use the explicit (y*12+m) formula:
    Spark months_between (day-fraction) and DuckDB date_diff('month',…)
    (boundary count) genuinely disagree, so neither builtin is portable."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 90 DAYS")).alias("ship_by"),
        ((F.lit(2002) - F.year(d)) * 12 + (F.lit(1) - F.month(d))).cast("long").alias(
            "months_to_2002"
        ),
        F.last_day(d).cast("string").alias("eom"),
        # o_orderdate is TIMESTAMP_NTZ in the parquet; with the session
        # pinned to UTC the cast to TIMESTAMP is value-preserving
        um(d).alias("epoch_us"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(l_extendedprice, 1)                                AS price_r1,
      CAST(floor(l_extendedprice) AS BIGINT)                   AS price_floor,
      CAST(ceil(l_extendedprice) AS BIGINT)                    AS price_ceil,
      round(abs(l_extendedprice - 30000), 6)                   AS dist_30k,
      round(pow(l_quantity, 2), 6)                             AS qty_sq,
      round(sqrt(l_extendedprice), 6)                          AS price_sqrt,
      round(ln(l_extendedprice), 6)                            AS price_ln,
      round(log10(l_extendedprice), 6)                         AS price_log10,
      round(exp(l_discount), 6)                                AS disc_exp,
      l_orderkey % 7                                           AS key_mod7,
      CAST(sign(l_extendedprice - 30000) AS BIGINT)            AS over_30k,
      greatest(l_quantity, 25.0)                               AS qty_hi,
      least(l_quantity, 25.0)                                  AS qty_lo
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface. floor/ceil/sign are width-normalized to
    BIGINT (Spark: floor→LONG, sign→DOUBLE; DuckDB: floor→DOUBLE,
    sign→TINYINT). Transcendentals (libm) agree to the last ulp in practice
    and are rounded to 6 anyway."""
    li = t(spark, sf_dir, "lineitem")
    price, qty, disc = F.col("l_extendedprice"), F.col("l_quantity"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("price_r1"),
        bi(F.floor(price)).alias("price_floor"),
        bi(F.ceil(price)).alias("price_ceil"),
        r6(F.abs(price - 30000)).alias("dist_30k"),
        r6(F.pow(qty, 2)).alias("qty_sq"),
        r6(F.sqrt(price)).alias("price_sqrt"),
        r6(F.log(price)).alias("price_ln"),
        r6(F.log10(price)).alias("price_log10"),
        r6(F.exp(disc)).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        bi(F.signum(price - 30000)).alias("over_30k"),
        F.greatest(qty, F.lit(25.0)).alias("qty_hi"),
        F.least(qty, F.lit(25.0)).alias("qty_lo"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice < 50000 THEN 'low'
        WHEN o_totalprice < 150000 THEN
          CASE WHEN o_orderstatus = 'F' THEN 'mid-final' ELSE 'mid-open' END
        ELSE 'high'
      END                                                        AS price_band,
      coalesce(nullif(o_orderstatus, 'P'), 'pending')            AS status_or_pending,
      CAST(CAST(o_totalprice > 100000 AS INTEGER) AS BIGINT)     AS is_big,
      round(o_totalprice / nullif(year(o_orderdate) - 1995, 0), 6) AS per_year_since
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested CASE / coalesce / nullif / boolean→int; division guarded with
    nullif (div-by-zero: Spark→NULL silently, DuckDB→error)."""
    o = t(spark, sf_dir, "orders")
    price, st = F.col("o_totalprice"), F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(price < 50000, "low")
        .when(price < 150000, F.when(st == "F", "mid-final").otherwise("mid-open"))
        .otherwise("high")
        .alias("price_band"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("pending")).alias("status_or_pending"),
        (price > 100000).cast("int").cast("long").alias("is_big"),
        r6(price / F.nullif(F.year("o_orderdate") - 1995, F.lit(0))).alias("per_year_since"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           'docs.example.com'                         AS host,
           '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           source                                     AS src_param
    FROM documents
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: build a URL from row data, then recover host /
    path / a named query parameter with parse_url. The oracle states the
    algebraic inverse (what each component must decode back to), so a
    match certifies the round-trip rather than re-implementing a URL
    parser in SQL. Pure projection, zero shuffle."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://docs.example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?src="),
        F.col("source"),
        F.lit("&v=1"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("src")).alias("src_param"),
    )


@query(
    "fn_binary_codec",
    oracle="""
    SELECT doc_id,
           md5(text)                                          AS text_md5,
           sha256(text)                                       AS text_sha256,
           lower(hex(CAST(substr(text, 1, 8) AS BLOB)))       AS head_hex,
           to_base64(CAST(substr(text, 1, 12) AS BLOB))       AS head_b64,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)   AS n_bytes,
           (CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR) = text) AS roundtrip_ok
    FROM documents
    """,
)
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: md5 / sha256 digests, hex and base64
    encodings (with a base64→unbase64 round-trip proof) over utf8 text
    bytes. Digests are THE cross-system content-addressing primitive
    (dedup_exact's 100 TB note groups on one); all functions are per-row
    JVM codegen — zero shuffle, embarrassingly parallel. Corpus text is
    ASCII by construction so string/byte length agree; the hex is
    lower()ed on both engines (Spark emits uppercase, DuckDB lower)."""
    d = t(spark, sf_dir, "documents")
    tb = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.md5(tb).alias("text_md5"),
        F.sha2(tb, 256).alias("text_sha256"),
        F.lower(F.hex(F.substring("text", 1, 8).cast("binary"))).alias("head_hex"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("head_b64"),
        bi(F.length(tb)).alias("n_bytes"),
        (F.unbase64(F.base64(tb)).cast("string") == F.col("text")).alias("roundtrip_ok"),
    )
