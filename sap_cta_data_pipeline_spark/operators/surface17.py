"""§2 round-8 batch DI — corpus HTML stripping, rank-based testing at
scale, geometric containment, and a portable table checksum.

All four carry full DuckDB value oracles. The Mann-Whitney lane is the
batch's scale statement: rank tests naively need a GLOBAL sort, but on
binned values the rank structure collapses to an O(distinct-bins) grain
(midranks from a cumulative count), so the test runs as two bounded
aggregations — the same discipline as agg_percentile_bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "text_html_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             '<div class="doc"><p id="t">'
               || replace(text, 'e', '&lt;e&gt;')
               || '</p><br/></div>' AS html
      FROM documents
    ), s AS (
      SELECT doc_id, html,
             len(regexp_extract_all(html, '<[^>]+>')) AS n_tags,
             trim(regexp_replace(
               replace(replace(replace(
                 regexp_replace(html, '<[^>]+>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
               ' +', ' ', 'g')) AS stripped
      FROM h
    )
    SELECT doc_id, CAST(n_tags AS BIGINT) AS n_tags,
           CAST(length(stripped) AS BIGINT) AS stripped_len,
           substr(stripped, 1, 40) AS head
    FROM s
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction — the first stage of every web-corpus
    pipeline: drop tags, decode the core entities (&lt; &gt; &amp;),
    collapse whitespace. The markup is synthesized in-query from the
    shared corpus (wrap + entity-inject), so the oracle certifies the
    STRIP logic — tag regex, entity decode order (entities first would
    corrupt '&amp;lt;'), whitespace collapse — against the identical
    input in both engines. Per-row JVM regex, embarrassingly parallel;
    at 100 TB this is a pure map stage with zero shuffle."""
    d = t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="doc"><p id="t">'),
        F.regexp_replace(F.col("text"), "e", "&lt;e&gt;"),
        F.lit("</p><br/></div>"),
    )
    h = d.select("doc_id", html.alias("html"))
    no_tags = F.regexp_replace(F.col("html"), "<[^>]+>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"
        ),
        "&amp;",
        "&",
    )
    stripped = F.trim(F.regexp_replace(decoded, " +", " "))
    return h.select(
        "doc_id",
        bi(F.size(F.regexp_extract_all(F.col("html"), F.lit("<[^>]+>"), 0))).alias(
            "n_tags"
        ),
        bi(F.length(stripped)).alias("stripped_len"),
        F.substring(stripped, 1, 40).alias("head"),
    )


@query(
    "stats_mannwhitney_binned",
    oracle="""
    WITH b AS (
      SELECT event_type, round(value, 1) AS v,
             CAST(user_id % 2 AS INTEGER) AS g
      FROM events WHERE value IS NOT NULL
    ), cnt AS (
      SELECT event_type, v,
             sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1
      FROM b GROUP BY 1, 2
    ), mr AS (
      SELECT event_type, v, n0, n1, n0 + n1 AS tv,
             coalesce(sum(n0 + n1) OVER (
               PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + (n0 + n1 + 1) / 2.0 AS midrank
      FROM cnt
    ), agg AS (
      SELECT event_type,
             sum(n0) AS m0, sum(n1) AS m1,
             sum(n1 * midrank) AS r1,
             sum(tv * tv * tv - tv) AS ties
      FROM mr GROUP BY 1
    )
    SELECT event_type,
           CAST(m0 AS BIGINT) AS n_ctrl,
           CAST(m1 AS BIGINT) AS n_treat,
           round(r1 - m1 * (m1 + 1) / 2.0, 4) AS u_stat,
           round((r1 - m1 * (m1 + 1) / 2.0 - m0 * m1 / 2.0)
                 / sqrt(m0 * m1 / 12.0 * ((m0 + m1 + 1)
                        - ties / ((m0 + m1) * (m0 + m1 - 1.0)))), 6) AS z
    FROM agg
    """,
)
def stats_mannwhitney_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the hash-split arms,
    per event type — the nonparametric A/B test for skewed metrics where
    the t-test's mean is the wrong question. The naive test GLOBAL-sorts
    to rank; on values binned to one decimal the entire rank structure
    is recoverable from per-bin counts: midrank(bin) = (count before) +
    (tie count + 1)/2, so the plan is one (type, bin, arm) counting agg
    → a window over the O(bins) grain → the U statistic with the
    standard tie-corrected normal approximation. Binning is the
    documented trade (ties are exact; resolution 0.1) — the same
    rank-at-scale discipline as agg_percentile_bands and Spearman's
    keyed variant."""
    b = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round("value", 1).alias("v"),
            (F.col("user_id") % 2).cast("int").alias("g"),
        )
    )
    cnt = b.groupBy("event_type", "v").agg(
        F.sum((F.col("g") == 0).cast("int")).alias("n0"),
        F.sum((F.col("g") == 1).cast("int")).alias("n1"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tv = F.col("n0") + F.col("n1")
    mr = cnt.select(
        "event_type",
        "n0",
        "n1",
        tv.alias("tv"),
        (F.coalesce(F.sum(tv).over(w), F.lit(0)) + (tv + 1) / 2.0).alias(
            "midrank"
        ),
    )
    agg = mr.groupBy("event_type").agg(
        F.sum("n0").alias("m0"),
        F.sum("n1").alias("m1"),
        F.sum(F.col("n1") * F.col("midrank")).alias("r1"),
        F.sum(F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")).alias("ties"),
    )
    m0, m1 = F.col("m0"), F.col("m1")
    u = F.col("r1") - m1 * (m1 + 1) / 2.0
    var = (
        m0
        * m1
        / 12.0
        * ((m0 + m1 + 1) - F.col("ties") / ((m0 + m1) * (m0 + m1 - 1.0)))
    )
    return agg.select(
        "event_type",
        bi(m0).alias("n_ctrl"),
        bi(m1).alias("n_treat"),
        F.round(u, 4).alias("u_stat"),
        r6((u - m0 * m1 / 2.0) / F.sqrt(var)).alias("z"),
    )


#: Test polygon (camera acceptance region): a convex pentagon in the
#: (acctbal_k, nationkey) plane, vertices chosen off any data lattice.
_POLY = [
    (-9.7, 1.3),
    (-2.1, 26.2),
    (6.3, 24.1),
    (10.6, 8.7),
    (3.2, -4.9),
]


def _poly_edges_sql() -> str:
    edges = []
    for i, (x1, y1) in enumerate(_POLY):
        x2, y2 = _POLY[(i + 1) % len(_POLY)]
        edges.append(
            f"CASE WHEN ({y1} > py) != ({y2} > py) AND "
            f"px < ({x2} - {x1}) * (py - {y1}) / ({y2} - {y1}) + {x1} "
            f"THEN 1 ELSE 0 END"
        )
    return " + ".join(edges)


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, c_acctbal / 1000.0 AS px,
             CAST(c_nationkey AS DOUBLE) AS py
      FROM customer
    )
    SELECT CAST(({_poly_edges_sql()}) % 2 AS BIGINT) AS inside,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(px), 6) AS avg_x
    FROM pts
    GROUP BY 1
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon via ray casting — the geofencing primitive, with
    no spatial extension on either engine: a point is inside iff a
    horizontal ray crosses the polygon boundary an odd number of times.
    The polygon is a bounded literal, so the crossing count folds IN-ROW
    (one CASE per edge, summed) — zero shuffle before the final
    audit agg; at 100 TB this is a map stage, and a polygon SET would
    broadcast (bounded by construction) and explode per candidate via
    a grid-cell prefilter (the geo_grid_distance_join pattern)."""
    c = t(spark, sf_dir, "customer").select(
        (F.col("c_acctbal") / 1000.0).alias("px"),
        F.col("c_nationkey").cast("double").alias("py"),
    )
    crossings = None
    for i, (x1, y1) in enumerate(_POLY):
        x2, y2 = _POLY[(i + 1) % len(_POLY)]
        hit = (
            ((F.lit(y1) > F.col("py")) != (F.lit(y2) > F.col("py")))
            & (
                F.col("px")
                < (x2 - x1) * (F.col("py") - y1) / (y2 - y1) + x1
            )
        ).cast("int")
        crossings = hit if crossings is None else crossings + hit
    return (
        c.select((crossings % 2).alias("inside"), "px")
        .groupBy(bi(F.col("inside")).alias("inside"))
        .agg(
            bi(F.count(F.lit(1))).alias("n_points"),
            r6(F.avg("px")).alias("avg_x"),
        )
    )


@query(
    "dq_table_checksum",
    oracle="""
    WITH h AS (
      SELECT md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
               o_orderstatus, CAST(round(o_totalprice, 2) AS VARCHAR),
               o_orderpriority)) AS d
      FROM orders
    )
    SELECT substr(d, 1, 1) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(d) AS min_digest,
           max(d) AS max_digest
    FROM h GROUP BY 1
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table CONTENT fingerprint — the migration /
    replication validation op ("did the copy arrive intact?"): one md5
    per row over a canonical column serialization, digested into a
    16-bucket histogram (count + min/max digest per leading hex char).
    Two tables match iff all 16 rows match; a single changed row moves
    its bucket's count or an extremum with overwhelming probability.
    One scan + one 16-group agg — no sort, no collect; md5 and the
    '|'-joined canonical form are engine-portable (numbers rendered
    through explicit CASTs so formatting can't drift)."""
    o = t(spark, sf_dir, "orders")
    d = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round("o_totalprice", 2).cast("string"),
            F.col("o_orderpriority"),
        )
    )
    return (
        o.select(d.alias("d"))
        .groupBy(F.substring("d", 1, 1).alias("bucket"))
        .agg(
            bi(F.count(F.lit(1))).alias("n_rows"),
            F.min("d").alias("min_digest"),
            F.max("d").alias("max_digest"),
        )
    )


# ------------------------------------------------- round-8 batch DK


@query(
    "agg_percentile_cont_multi",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(CAST(l_quantity AS DOUBLE),
                           [0.25, 0.5, 0.75, 0.95]) AS qs
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           round(qs[1], 6) AS p25, round(qs[2], 6) AS p50,
           round(qs[3], 6) AS p75, round(qs[4], 6) AS p95
    FROM q
    """,
)
def agg_percentile_cont_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles at multiple points in one agg —
    Spark ``percentile(col, array(...))`` ↔ DuckDB ``quantile_cont``
    (both linear-interpolate at h = (n−1)p, certified identical by the
    hash; the DuckDB side casts to DOUBLE first because quantile_cont
    on DECIMAL quantizes to the input scale). Exact percentiles sort
    within each group — the documented cost; the approx_percentile /
    t-digest lanes are the 100-TB default and THIS lane is the
    calibration reference they're judged against."""
    li = t(spark, sf_dir, "lineitem")
    qs = F.percentile("l_quantity", F.lit([0.25, 0.5, 0.75, 0.95]))
    g = li.groupBy("l_returnflag").agg(qs.alias("qs"))
    return g.select(
        "l_returnflag",
        *[
            r6(F.element_at("qs", i + 1)).alias(n)
            for i, n in enumerate(["p25", "p50", "p75", "p95"])
        ],
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'),
    stats AS (
      SELECT count(*) AS n_keys, min(k) AS min_key, max(k) AS max_key
      FROM k
    ),
    run_ends AS (
      SELECT a.k FROM k a LEFT JOIN k b ON b.k = a.k + 1
      WHERE b.k IS NULL
    ),
    ends AS (SELECT count(*) AS n_ends FROM run_ends),
    firsts AS (
      SELECT list_sort(list(k)) AS ls FROM (
        SELECT k FROM run_ends, stats s2
        WHERE k != s2.max_key ORDER BY k LIMIT 4
      )
    )
    SELECT s.n_keys AS n_keys,
           CAST(s.min_key AS BIGINT) AS min_key,
           CAST(s.max_key AS BIGINT) AS max_key,
           CAST(s.max_key - s.min_key + 1 - s.n_keys AS BIGINT) AS n_missing,
           CAST(e.n_ends - 1 AS BIGINT) AS n_gaps,
           coalesce(f.ls, []) AS first_gap_starts
    FROM stats s, ends e, firsts f
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit for an id column that SHOULD be dense
    (invoice numbers, ledger ids): total missing count from min/max/count
    arithmetic, gap count and the first gap positions from run-end
    detection — a key k ends a run iff k+1 is absent, found by one keyed
    SELF anti-join (no sort, no lead() window over the corpus: the
    global-order trap a naive gaps query hits). The audited sequence is
    the OPEN-status keys (the synthetic generator's orderkeys are dense,
    so the status filter supplies the gaps a real invoice audit would
    find)."""
    k = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    stats = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    nxt = k.select((F.col("k") - 1).alias("k"))
    run_ends = k.join(nxt, "k", "left_anti")  # k where k+1 absent
    n_ends = run_ends.agg(F.count(F.lit(1)).alias("n_ends"))
    firsts = (
        run_ends.crossJoin(F.broadcast(stats.select("max_key")))  # bounded: 1 row
        .where(F.col("k") != F.col("max_key"))
        .orderBy("k")
        .limit(4)  # TakeOrdered — per-partition heaps, no global sort
        .agg(F.sort_array(F.collect_list("k")).alias("first_gap_starts"))
    )
    return (
        stats.crossJoin(F.broadcast(n_ends))  # bounded: 1 row
        .crossJoin(F.broadcast(firsts))  # bounded: 1 row
        .select(
            bi(F.col("n_keys")).alias("n_keys"),
            bi(F.col("min_key")).alias("min_key"),
            bi(F.col("max_key")).alias("max_key"),
            bi(F.col("max_key") - F.col("min_key") + 1 - F.col("n_keys")).alias(
                "n_missing"
            ),
            bi(F.col("n_ends") - 1).alias("n_gaps"),
            "first_gap_starts",
        )
    )


@query(
    "part_inventory_eoq",
    oracle="""
    WITH d AS (
      SELECT l_partkey,
             sum(l_quantity) AS annual_demand,
             avg(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY 1
    ), scored AS (
      SELECT l_partkey, annual_demand, unit_price,
             sqrt(2.0 * annual_demand * 100.0 / (0.2 * unit_price)) AS eoq
      FROM d
    )
    SELECT CAST(l_partkey AS BIGINT) AS partkey,
           round(annual_demand, 2) AS annual_demand,
           round(eoq, 6) AS eoq,
           CAST(ceil(annual_demand / eoq) AS BIGINT) AS orders_per_year
    FROM scored
    ORDER BY annual_demand DESC, l_partkey ASC
    LIMIT 50
    """,
)
def part_inventory_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic Order Quantity per part — the inventory-planning
    closed form EOQ = sqrt(2·D·S / H) (ordering cost S = 100, holding
    cost H = 20% of unit price): one part-keyed agg for demand and unit
    price, in-row algebra, top-50 by demand via TakeOrderedAndProject
    (per-partition heaps + driver merge — no global sort). The shape a
    supply-chain user runs daily over the full history."""
    li = t(spark, sf_dir, "lineitem")
    d = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("annual_demand"),
        F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    eoq = F.sqrt(2.0 * F.col("annual_demand") * 100.0 / (0.2 * F.col("unit_price")))
    return (
        d.select(
            bi(F.col("l_partkey")).alias("partkey"),
            F.round("annual_demand", 2).alias("annual_demand"),
            r6(eoq).alias("eoq"),
            bi(F.ceil(F.col("annual_demand") / eoq)).alias("orders_per_year"),
        )
        .orderBy(F.col("annual_demand").desc(), F.col("partkey").asc())
        .limit(50)
    )
