"""§2 round-2 addendum — composite end-to-end analytic queries (TPC-H shapes).

The single-operator inventory proves each relational primitive in isolation;
these three queries prove they compose: multi-way joins with mixed
broadcast/shuffle strategies, selective date/segment predicates that must
reach the parquet scans, partial+final aggregation over the join result, and
deterministic top-k. They are the classic TPC-H shapes (Q3 shipping
priority, Q5 local supplier volume, Q10 returned items), adapted to the
driver schema (no shippriority / commitdate / phone columns).

Scale notes (100 TB posture):

- ``nation`` / ``region`` are O(10²) rows at any scale factor → always
  broadcast; asserting that keeps the six-way Q5 join at two shuffles
  (custkey, orderkey+suppkey) instead of five.
- ``customer`` / ``supplier`` / ``orders`` / ``lineitem`` all grow with SF,
  so fact-to-fact edges are shuffle joins on their natural keys and we rely
  on the selective predicates (date window, mktsegment, returnflag) being
  pushed into the scans — tests/test_plans.py asserts PushedFilters for Q3.
- Top-k (Q3/Q10) is LIMIT-after-sort → Spark plans TakeOrderedAndProject:
  per-partition heap + driver merge of k rows, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r2, r6
from ..functions.ranks import ntile_expr, with_global_cumsum, with_global_row_number
from ..registry import query


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped revenue of BUILDING-segment orders placed
    before the cutoff. customer⋈orders shuffles on custkey, then ⋈lineitem
    on orderkey; both date predicates and the segment filter sit directly
    on the scans (pushed down). Deterministic top-10 via (revenue desc,
    orderkey) → TakeOrderedAndProject."""
    cutoff = "1998-06-01"
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz"))
    l = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz"))
    joined = (
        c.select("c_custkey")
        .join(o.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
              c["c_custkey"] == o["o_custkey"])
        .join(l.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where customer and supplier share
    an ASIA nation. nation⋈region is collapsed first and broadcast (O(10²)
    rows at any SF), which also pre-filters supplier to ASIA before the
    fact-side join — the six-way join then needs only the custkey and
    orderkey/suppkey shuffles."""
    asia_nations = (
        t(spark, sf_dir, "nation")
        .join(t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        c.join(o.select("o_custkey", "o_orderkey"), c["c_custkey"] == o["o_custkey"])
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return joined.groupBy("n_name").agg(
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one quarter,
    top-20. The quarter predicate prunes orders at the scan, returnflag
    prunes lineitem at the scan; nation is broadcast onto the aggregated
    side. Top-20 via (revenue desc, custkey) → TakeOrderedAndProject."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        c.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .join(o.select("o_custkey", "o_orderkey"), F.col("c_custkey") == F.col("o_custkey"))
        .join(l.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", r2(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "orders_copurchase_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pop AS (
      SELECT l_partkey FROM li GROUP BY l_partkey HAVING count(*) >= 3
    ),
    f AS (SELECT l.l_orderkey, l.l_partkey FROM li l JOIN pop USING (l_partkey))
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
    FROM f a
    JOIN f b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def orders_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in ≥2
    orders. The a-priori prune comes FIRST — only parts with support ≥3
    enter the basket self-join (no frequent pair can contain an
    infrequent part), which is what keeps the per-order pair expansion
    from going quadratic in basket size at scale; the self-join is
    equi-keyed on the order id so pair generation is local to each
    basket."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    pop = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s")).where(
        F.col("s") >= 3
    )
    f = li.join(pop.select("l_partkey"), "l_partkey")
    a = f.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = f.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary_c
      FROM orders GROUP BY 1
    )
    SELECT custkey,
           CAST(date_diff('day', CAST(last_order AS DATE), DATE '2001-09-01') AS BIGINT)
             AS recency_days,
           frequency,
           CAST(monetary_c AS DOUBLE) / 100 AS monetary,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, custkey) AS BIGINT) AS r_q,
           CAST(ntile(4) OVER (ORDER BY frequency  DESC, custkey) AS BIGINT) AS f_q,
           CAST(ntile(4) OVER (ORDER BY monetary_c DESC, custkey) AS BIGINT) AS m_q
    FROM rfm
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary per customer, each cut
    into quartiles. Money flows as exact integer cents (quantized once
    per row, summed as BIGINT) so the monetary quartile ordering is
    float-summation-proof. The per-customer aggregate is one keyed pass
    over orders; each quartile cut is a RANGE-PARTITIONED global
    row_number (functions/ranks.py — no single-partition window
    anywhere) fed through the closed-form ntile expression, bit-identical
    to the ntile(4) window with pinned tie-breaks."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("monetary_c"),
    )
    ranked = with_global_row_number(
        rfm, [F.desc("last_order"), F.asc("custkey")], "_rn_r", total_col="_tot"
    )
    ranked = with_global_row_number(
        ranked, [F.desc("frequency"), F.asc("custkey")], "_rn_f"
    )
    ranked = with_global_row_number(
        ranked, [F.desc("monetary_c"), F.asc("custkey")], "_rn_m"
    )
    return ranked.select(
        "custkey",
        F.datediff(F.lit("2001-09-01").cast("date"), F.to_date("last_order"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        (F.col("monetary_c").cast("double") / 100).alias("monetary"),
        ntile_expr(F.col("_rn_r"), F.col("_tot"), 4).cast("long").alias("r_q"),
        ntile_expr(F.col("_rn_f"), F.col("_tot"), 4).cast("long").alias("f_q"),
        ntile_expr(F.col("_rn_m"), F.col("_tot"), 4).cast("long").alias("m_q"),
    )


@query(
    "lineitem_abc_pareto",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
                  AS BIGINT) AS rev4
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT l_partkey, rev4,
             CAST(sum(rev4) OVER (ORDER BY rev4 DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum4,
             CAST(sum(rev4) OVER () AS BIGINT) AS tot4
      FROM p
    )
    SELECT l_partkey,
           CAST(rev4 AS DOUBLE) / 10000 AS revenue,
           CASE WHEN 5 * cum4 <= 4 * tot4 THEN 'A'
                WHEN 100 * cum4 <= 95 * tot4 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def lineitem_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, class A up to
    80 % of cumulative revenue, B to 95 %, C the tail. All money flows as
    EXACT INTEGER ten-thousandths (each item's revenue quantized once, in
    identical IEEE arithmetic, then summed as BIGINT) and the class
    boundaries compare integers (5·cum ≤ 4·total) — zero float-summation
    sensitivity at any group count, where a rounded-double formulation
    flips classes whenever a sum lands on a half-cent. One keyed agg +
    one RANGE-PARTITIONED global running sum (functions/ranks.py): local
    cumsums at full parallelism + broadcast per-partition sum offsets —
    no single-partition window on the data path."""
    li = t(spark, sf_dir, "lineitem")
    rev4_item = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(rev4_item).alias("rev4"))
    c = with_global_cumsum(
        p, [F.desc("rev4"), F.asc("l_partkey")], "rev4", "cum4", total_col="tot4"
    )
    return c.select(
        "l_partkey",
        (F.col("rev4").cast("double") / 10000).alias("revenue"),
        F.when(5 * F.col("cum4") <= 4 * F.col("tot4"), "A")
        .when(100 * F.col("cum4") <= 95 * F.col("tot4"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "orders_fulfillment_latency",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(min(l.l_shipdate) AS DATE)) AS first_ship_days,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(max(l.l_shipdate) AS DATE)) AS last_ship_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(first_ship_days), 6) AS avg_first_ship_days,
           round(avg(last_ship_days), 6) AS avg_last_ship_days,
           CAST(quantile_disc(last_ship_days, 0.9) AS BIGINT) AS p90_last_ship_days
    FROM per_order
    GROUP BY o_orderpriority
    """,
)
def orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time: per order, days from order date to first
    and last line shipment (the order isn't done until its LAST line
    ships), rolled up per priority class with a discrete p90 — the
    fulfillment SLA report. One fact-fact join on the natural key
    (lineitem⋈orders on orderkey — bucket-bounded at 100 TB per
    SCALE.md §C), one order-grain agg, one small priority-grain agg
    with an exact discrete percentile (percentile_disc picks a REAL
    observed latency, never an interpolated fraction of a day)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.to_date(F.min("l_shipdate")), F.to_date("o_orderdate")).alias(
                "first_ship_days"
            ),
            F.datediff(F.to_date(F.max("l_shipdate")), F.to_date("o_orderdate")).alias(
                "last_ship_days"
            ),
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        bi(F.count(F.lit(1))).alias("n_orders"),
        r6(F.avg("first_ship_days")).alias("avg_first_ship_days"),
        r6(F.avg("last_ship_days")).alias("avg_last_ship_days"),
        bi(
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY last_ship_days)")
        ).alias("p90_last_ship_days"),
    )


@query(
    "orders_price_index_laspeyres",
    oracle="""
    WITH py AS (
      SELECT l_partkey, year(l_shipdate) AS yr,
             sum(l_extendedprice) AS ext, sum(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, ext / qty AS p0, qty AS q0 FROM py WHERE yr = 1995
    )
    SELECT py.yr,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum((py.ext / py.qty) * base.q0) / sum(base.p0 * base.q0), 6)
             AS laspeyres_index
    FROM py JOIN base USING (l_partkey)
    WHERE py.yr <> 1995
    GROUP BY py.yr
    """,
)
def orders_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship-year: Σ p_t·q₀ / Σ p₀·q₀ over the
    basket of parts traded in the base year (1995), with p = quantity-
    weighted unit price per (part, year) — the inflation-tracking
    aggregate finance and pricing teams compute, and a nice composite of
    two keyed aggs + one part-keyed join: the (part, year) agg reduces
    the fact table before any join, the base-year basket is a part-grain
    dimension (broadcastable), and the index itself is a year-grain
    agg — three shuffles total, all keyed, none fact-sized after the
    first."""
    li = t(spark, sf_dir, "lineitem")
    py = li.groupBy("l_partkey", F.year("l_shipdate").alias("yr")).agg(
        F.sum("l_extendedprice").alias("ext"), F.sum("l_quantity").alias("qty")
    )
    base = py.where(F.col("yr") == 1995).select(
        "l_partkey",
        (F.col("ext") / F.col("qty")).alias("p0"),
        F.col("qty").alias("q0"),
    )
    return (
        py.where(F.col("yr") != 1995)
        .join(base, "l_partkey")
        .groupBy("yr")
        .agg(
            bi(F.count(F.lit(1))).alias("n_parts"),
            r6(
                F.sum((F.col("ext") / F.col("qty")) * F.col("q0"))
                / F.sum(F.col("p0") * F.col("q0"))
            ).alias("laspeyres_index"),
        )
    )


@query(
    "customer_segment_migration",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             CASE WHEN sum(o_totalprice) >= 400000 THEN 'high'
                  WHEN sum(o_totalprice) >= 150000 THEN 'mid'
                  ELSE 'low' END AS segment
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.yr AS from_year, a.segment AS from_segment, b.segment AS to_segment
      FROM yearly a JOIN yearly b
        ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
    )
    SELECT from_year, from_segment, to_segment,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM paired
    GROUP BY 1, 2, 3
    """,
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment migration matrix: customers banded by yearly spend (fixed
    thresholds — the quantile-banded variant is agg_percentile_bands'
    documented swap) and counted across consecutive-year transitions
    (high→mid, low→high churn/upgrade flows — the Sankey behind every
    retention deck). The year-over-year pairing is a SELF-join on
    (customer, adjacent year) — equi-keyed on the customer, so pair
    generation is local to each customer's handful of year rows; the
    fact table reduces to (customer, year) grain BEFORE the join. A lag
    window over yr would do the same with one shuffle — the join form
    is kept because the oracle and the plan both stay obvious, and both
    sides are the same post-agg frame (self-join reuses the exchange)."""
    o = t(spark, sf_dir, "orders")
    yearly = (
        o.groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("spend"))
        .select(
            "o_custkey",
            "yr",
            F.when(F.col("spend") >= 400_000, "high")
            .when(F.col("spend") >= 150_000, "mid")
            .otherwise("low")
            .alias("segment"),
        )
    )
    a = yearly.select(
        F.col("o_custkey").alias("ck"),
        F.col("yr").alias("from_year"),
        F.col("segment").alias("from_segment"),
    )
    b = yearly.select(
        F.col("o_custkey").alias("ck2"),
        F.col("yr").alias("to_yr"),
        F.col("segment").alias("to_segment"),
    )
    return (
        a.join(b, (F.col("ck") == F.col("ck2")) & (F.col("to_yr") == F.col("from_year") + 1))
        .groupBy("from_year", "from_segment", "to_segment")
        .agg(bi(F.count(F.lit(1))).alias("n_customers"))
    )


@query(
    "customer_spend_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS s
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT s, CAST(row_number() OVER (ORDER BY s, o_custkey) AS BIGINT) AS i
      FROM spend
    ),
    agg AS (
      SELECT count(*) AS n, sum(s) AS total, sum(i * s) AS weighted
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(total, 2) AS total_spend,
           round(2.0 * weighted / (n * total) - (n + 1.0) / n, 6) AS gini
    FROM agg
    """,
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality number behind
    'x% of revenue comes from y% of customers' (lineitem_abc_pareto
    draws the curve; this is its scalar). Needs every customer's GLOBAL
    rank by spend — computed with the functions/ranks.py
    range-partitioned layout (local row_numbers + broadcast offsets),
    NOT an unpartitioned window, so the rank pass parallelizes at any
    cardinality; the Σ i·xᵢ reduction is then one keyed-free global agg
    of 3 numbers. Spend is pre-rounded r2 (exact cents) so rank ties
    break identically on both engines via the (spend, custkey) total
    order; the Gini ratio itself is r6 (relative float error ~1e-13,
    §5.3 policy)."""
    from ..functions.ranks import with_global_row_number

    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    ranked = with_global_row_number(
        spend, [F.col("s"), F.col("o_custkey")], rn_col="i"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("total"),
        F.sum(F.col("i").cast("double") * F.col("s")).alias("weighted"),
    )
    return agg.select(
        bi(F.col("n")).alias("n_customers"),
        F.round("total", 2).alias("total_spend"),
        r6(
            2.0 * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n")
        ).alias("gini"),
    )


@query(
    "customer_interpurchase_time",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, median(gap_days) AS med_gap, count(*) AS n_gaps
      FROM gaps WHERE gap_days IS NOT NULL
      GROUP BY o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(med_gap), 6) AS avg_median_gap_days,
           round(quantile_cont(med_gap, 0.5), 6) AS p50_of_medians,
           round(quantile_cont(med_gap, 0.9), 6) AS p90_of_medians,
           CAST(count(*) FILTER (WHERE med_gap <= 30) AS BIGINT) AS n_monthly_buyers
    FROM per_cust
    """,
)
def customer_interpurchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time — THE repeat-buying cadence metric: per
    customer, the median days between consecutive orders (lag over the
    customer's order sequence; median, not mean, because one long
    vacation gap shouldn't define a cadence), then the corpus-level
    distribution of those medians and a ≤30-day 'monthly buyer' count.
    Everything customer-keyed until the final 1-row reduction: the lag
    window and the per-customer median share one shuffle key. Medians
    of integer day-gaps interpolate on identical integers → identical
    doubles both engines (§5.3)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    per_cust = gaps.groupBy("o_custkey").agg(
        F.expr("percentile(gap_days, 0.5)").alias("med_gap"),
        F.count(F.lit(1)).alias("n_gaps"),
    )
    return per_cust.agg(
        bi(F.count(F.lit(1))).alias("n_customers"),
        r6(F.avg("med_gap")).alias("avg_median_gap_days"),
        r6(F.expr("percentile(med_gap, 0.5)")).alias("p50_of_medians"),
        r6(F.expr("percentile(med_gap, 0.9)")).alias("p90_of_medians"),
        bi(F.sum((F.col("med_gap") <= 30).cast("int"))).alias("n_monthly_buyers"),
    )


@query(
    "orders_basket_profile",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, count(*) AS n_lines,
             count(DISTINCT l_partkey) AS n_parts,
             round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_lines AS BIGINT) AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(n_parts), 6) AS avg_distinct_parts,
           round(avg(total_qty), 6) AS avg_total_qty
    FROM baskets
    GROUP BY n_lines
    """,
)
def orders_basket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: orders histogrammed by line count, with
    average distinct parts and quantity per size bucket — the
    merchandising profile that sizes the co-purchase self-join
    (orders_copurchase_pairs' pair expansion is Σ basket² — THIS
    histogram is where you check that bound before running it). Two
    keyed aggs: order grain then size grain; the distinct-part count
    rides the order-grain agg. Output is ≤ max-basket-size rows at any
    corpus size."""
    li = t(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )
    return baskets.groupBy(bi(F.col("n_lines")).alias("basket_size")).agg(
        bi(F.count(F.lit(1))).alias("n_orders"),
        r6(F.avg("n_parts")).alias("avg_distinct_parts"),
        r6(F.avg("total_qty")).alias("avg_total_qty"),
    )


@query(
    "orders_mix_shift_decomposition",
    oracle="""
    WITH yr AS (
      SELECT o_orderpriority AS prio, year(o_orderdate) AS y,
             count(*) AS n, sum(o_totalprice) AS rev
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT y, sum(n) AS n_tot FROM yr GROUP BY y
    ),
    m AS (
      SELECT p.prio,
             a.n / CAST(ta.n_tot AS DOUBLE) AS share0,
             b.n / CAST(tb.n_tot AS DOUBLE) AS share1,
             a.rev / a.n AS rate0,
             b.rev / b.n AS rate1
      FROM (SELECT DISTINCT prio FROM yr) p
      JOIN yr a ON a.prio = p.prio AND a.y = 1996
      JOIN yr b ON b.prio = p.prio AND b.y = 1997
      JOIN tot ta ON ta.y = 1996
      JOIN tot tb ON tb.y = 1997
    )
    SELECT prio,
           round(share0, 6) AS share_1996, round(share1, 6) AS share_1997,
           round(rate0, 2) AS avg_order_1996, round(rate1, 2) AS avg_order_1997,
           round((share1 - share0) * rate0, 2) AS mix_effect,
           round(share0 * (rate1 - rate0), 2) AS rate_effect,
           round((share1 - share0) * (rate1 - rate0), 2) AS interaction
    FROM m
    """,
)
def orders_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift decomposition 1996→1997 per order priority: the change
    in per-order revenue contribution split into MIX effect (share
    moved), RATE effect (average order value moved), and the
    interaction term — the FP&A analysis that answers 'did revenue/order
    change because customers changed WHAT they buy or HOW MUCH each
    bucket pays'. Both years aggregate in ONE scan (year ∈ filter pushes
    down); the per-year totals are 2-row broadcasts; the decomposition
    is arithmetic over the |priority|-grain join. Shares and rates are
    ratios of exact integers/cent-sums → §5.3-clean."""
    o = t(spark, sf_dir, "orders").where(F.year("o_orderdate").isin(1996, 1997))
    yr = o.groupBy(
        F.col("o_orderpriority").alias("prio"), F.year("o_orderdate").alias("y")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
    tot = yr.groupBy("y").agg(F.sum("n").alias("n_tot"))
    a = yr.where(F.col("y") == 1996).select(
        "prio", F.col("n").alias("n0"), F.col("rev").alias("rev0")
    )
    b = yr.where(F.col("y") == 1997).select(
        F.col("prio").alias("prio_b"), F.col("n").alias("n1"), F.col("rev").alias("rev1")
    )
    t0 = tot.where(F.col("y") == 1996).select(F.col("n_tot").alias("t0"))
    t1 = tot.where(F.col("y") == 1997).select(F.col("n_tot").alias("t1"))
    m = (
        a.join(b, a.prio == b.prio_b)
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    share0 = F.col("n0") / F.col("t0").cast("double")
    share1 = F.col("n1") / F.col("t1").cast("double")
    rate0 = F.col("rev0") / F.col("n0")
    rate1 = F.col("rev1") / F.col("n1")
    return m.select(
        "prio",
        r6(share0).alias("share_1996"),
        r6(share1).alias("share_1997"),
        F.round(rate0, 2).alias("avg_order_1996"),
        F.round(rate1, 2).alias("avg_order_1997"),
        F.round((share1 - share0) * rate0, 2).alias("mix_effect"),
        F.round(share0 * (rate1 - rate0), 2).alias("rate_effect"),
        F.round((share1 - share0) * (rate1 - rate0), 2).alias("interaction"),
    )


@query(
    "supplier_scorecard",
    oracle="""
    WITH li AS (
      SELECT l.l_suppkey,
             l.l_extendedprice * (1 - l.l_discount) AS net,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
             CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    s AS (
      SELECT l_suppkey,
             count(*) AS n_lines,
             round(sum(net), 2) AS revenue,
             round(avg(ret), 6) AS return_share,
             round(avg(late), 6) AS late_share
      FROM li GROUP BY 1
    )
    SELECT l_suppkey, CAST(n_lines AS BIGINT) AS n_lines, revenue,
           return_share, late_share,
           round(0.5 * (1 - return_share) + 0.5 * (1 - late_share), 6) AS composite_score
    FROM s
    ORDER BY round(0.5 * (1 - return_share) + 0.5 * (1 - late_share), 6) DESC,
             revenue DESC, l_suppkey
    LIMIT 20
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite supplier scorecard — the multi-metric ranking procurement
    actually runs: per supplier, net revenue, return share, late-shipment
    share (> 90 days order-to-ship), combined into a weighted composite
    and top-20 ranked under a deterministic total order. One fact-fact
    join (orderkey — the §C bucketable shape) feeding ONE supplier-keyed
    agg that computes every metric in a single pass (conditional
    averages, no per-metric re-scan); the ranking is
    TakeOrderedAndProject. Shares are exact-integer ratios; the
    composite rounds AFTER the weighted sum and the ORDER BY uses the
    ROUNDED score so the rank-20 cutoff is engine-identical (§5.3)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        (
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90
        ).cast("int").alias("late"),
    )
    s = j.groupBy("l_suppkey").agg(
        bi(F.count(F.lit(1))).alias("n_lines"),
        F.round(F.sum("net"), 2).alias("revenue"),
        r6(F.avg("ret")).alias("return_share"),
        r6(F.avg("late")).alias("late_share"),
    )
    composite = F.round(
        0.5 * (1 - F.col("return_share")) + 0.5 * (1 - F.col("late_share")), 6
    )
    return (
        s.withColumn("composite_score", composite)
        .orderBy(F.desc("composite_score"), F.desc("revenue"), F.asc("l_suppkey"))
        .limit(20)
    )


@query(
    "part_abc_xyz_matrix",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
                  AS BIGINT) AS rev4
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT l_partkey, rev4,
             CAST(sum(rev4) OVER (ORDER BY rev4 DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum4,
             CAST(sum(rev4) OVER () AS BIGINT) AS tot4
      FROM p
    ), abc AS (
      SELECT l_partkey, rev4,
             CASE WHEN 5 * cum4 <= 4 * tot4 THEN 'A'
                  WHEN 100 * cum4 <= 95 * tot4 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c
    ), monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ), xyz AS (
      SELECT l_partkey,
             CASE WHEN 2 * (max(q) - min(q)) * count(*) <= sum(q) THEN 'X'
                  WHEN (max(q) - min(q)) * count(*) <= sum(q) THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY 1
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(CAST(abc.rev4 AS DOUBLE)) / 10000, 2) AS revenue
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY 1, 2
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix — the planner's 9-cell part segmentation:
    value class (A/B/C by cumulative revenue share, lineitem_abc_pareto's
    exact-integer cum discipline via the range-partitioned cumsum helper)
    × demand-variability class (X/Y/Z by monthly-demand spread). The
    variability metric is (max−min)·n_months / total over integer
    monthly quantity sums with INTEGER threshold comparisons (≤0.5 → X,
    ≤1.0 → Y, else Z) — the same zero-float-boundary discipline as the
    ABC side, where a stddev-based cv would hinge class assignment on
    engine-specific float summation order. Two fact scans (revenue
    grain, month grain), both collapsing to part-grain before the
    broadcast-sized matrix join; 9-row output at any corpus size."""
    li = t(spark, sf_dir, "lineitem")
    rev4_item = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(rev4_item).alias("rev4"))
    c = with_global_cumsum(
        p, [F.desc("rev4"), F.asc("l_partkey")], "rev4", "cum4", total_col="tot4"
    )
    abc = c.select(
        "l_partkey",
        "rev4",
        F.when(5 * F.col("cum4") <= 4 * F.col("tot4"), "A")
        .when(100 * F.col("cum4") <= 95 * F.col("tot4"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    spread = (F.max("q") - F.min("q")) * F.count(F.lit(1))
    xyz = monthly.groupBy("l_partkey").agg(
        F.when(2 * spread <= F.sum("q"), "X")
        .when(spread <= F.sum("q"), "Y")
        .otherwise("Z")
        .alias("xyz_class")
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            bi(F.count(F.lit(1))).alias("n_parts"),
            r2(F.sum(F.col("rev4").cast("double")) / 10000).alias("revenue"),
        )
    )
