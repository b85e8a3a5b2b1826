"""§2 round-2 addendum — data-quality profiling.

profile_table computes the per-column quality profile (row count, null
count, exact distinct count, typed min/max) that every ingestion pipeline
runs before trusting a 100 TB drop. The distribution contract is ONE pass:
all columns' aggregates ride a single partial+final aggregate over one
scan (no per-column scan loop — profiling k columns must not cost k
scans), and the wide 1-row result is unpivoted driver-side-free via an
inline explode. Exact countDistinct on several columns in one agg plans
as Spark's expand + distinct-agg; at extreme cardinalities the documented
swap is approx_count_distinct (agg_countd_approx / agg_hll_mergeable are
the registered sketch twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r2
from ..registry import query


@query(
    "profile_table",
    oracle="""
    WITH base AS (SELECT * FROM orders)
    SELECT 'o_orderkey' AS column_name,
           count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 2) AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 2) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str
    FROM base
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2),
           NULL, NULL
    FROM base
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate), NULL, NULL,
           CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR),
           CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR)
    FROM base
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), NULL, NULL,
           min(o_orderstatus), max(o_orderstatus)
    FROM base
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL,
           min(o_orderpriority), max(o_orderpriority)
    FROM base
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of orders (2 numeric, 1 temporal, 2
    categorical columns): every aggregate — counts, nulls, exact
    distincts, typed min/max — is computed in ONE grouped-less aggregate
    over ONE scan, then the 1-row wide result explodes into the long
    (column_name, stats) layout. Numeric extremes land in min/max_num
    (rounded doubles), string/temporal extremes in min/max_str (dates via
    ISO cast) — a typed long schema instead of stringly-typed everything.
    The oracle's 5-scan UNION ALL is the readable spec; the Spark plan is
    the 1-scan production shape."""
    o = t(spark, sf_dir, "orders")
    wide = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # o_orderkey (numeric)
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        r2(F.min("o_orderkey").cast("double")).alias("min_key"),
        r2(F.max("o_orderkey").cast("double")).alias("max_key"),
        # o_totalprice (numeric)
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        r2(F.min("o_totalprice")).alias("min_price"),
        r2(F.max("o_totalprice")).alias("max_price"),
        # o_orderdate (temporal → ISO string)
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.min(F.to_date("o_orderdate")).cast("string").alias("min_date"),
        F.max(F.to_date("o_orderdate")).cast("string").alias("max_date"),
        # o_orderstatus (categorical)
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        # o_orderpriority (categorical)
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
    )

    def row(name, nn, nd, mn_num, mx_num, mn_str, mx_str):
        return F.struct(
            F.lit(name).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(nn)).alias("n_nulls"),
            F.col(nd).alias("n_distinct"),
            (F.col(mn_num) if mn_num else F.lit(None).cast("double")).alias("min_num"),
            (F.col(mx_num) if mx_num else F.lit(None).cast("double")).alias("max_num"),
            (F.col(mn_str) if mn_str else F.lit(None).cast("string")).alias("min_str"),
            (F.col(mx_str) if mx_str else F.lit(None).cast("string")).alias("max_str"),
        )

    rows = F.array(
        row("o_orderkey", "nn_key", "nd_key", "min_key", "max_key", None, None),
        row("o_totalprice", "nn_price", "nd_price", "min_price", "max_price", None, None),
        row("o_orderdate", "nn_date", "nd_date", None, None, "min_date", "max_date"),
        row("o_orderstatus", "nn_status", "nd_status", None, None, "min_status", "max_status"),
        row("o_orderpriority", "nn_prio", "nd_prio", None, None, "min_prio", "max_prio"),
    )
    return (
        wide.select(F.explode(rows).alias("p"))
        .select(
            "p.column_name",
            bi(F.col("p.n_rows")).alias("n_rows"),
            bi(F.col("p.n_nulls")).alias("n_nulls"),
            bi(F.col("p.n_distinct")).alias("n_distinct"),
            "p.min_num",
            "p.max_num",
            "p.min_str",
            "p.max_str",
        )
    )


@query(
    "profile_join_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY o_custkey
    ), stats AS (
      SELECT count(*)            AS n_keys,
             sum(cnt)            AS n_rows,
             max(cnt)            AS max_cnt,
             avg(cnt)            AS avg_cnt
      FROM per_key
    ), top AS (
      SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key ASC) AS rn
      FROM per_key
    )
    SELECT t.rn                                     AS rank,
           t.key                                    AS heavy_key,
           t.cnt                                    AS key_rows,
           s.n_keys                                 AS n_keys,
           round(CAST(s.max_cnt AS DOUBLE) / s.avg_cnt, 6)       AS skew_factor,
           round(CAST(t.cnt AS DOUBLE) / s.n_rows, 6)            AS share_of_rows
    FROM top t CROSS JOIN stats s
    WHERE t.rn <= 10
    """,
)
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the profiling pass run BEFORE picking a
    salt factor or trusting AQE's skew-join split: per-key row counts on
    the prospective join key (orders.o_custkey), the global skew factor
    (max/avg key size), and the top-10 heavy keys with their share of all
    rows. Plan: one key-keyed partial+final agg (the same shuffle the
    join itself would do, so the profile costs one pass of the join's
    first stage), a 1-row stats reduce broadcast back, and top-10 via
    TakeOrderedAndProject (per-partition heaps) with the rank window
    running over only the 10 survivors. At 100 TB run this on a sample partition
    first; a skew_factor ≫ 10 on the full profile is the trigger for
    join_salted_skew's explicit salting (its docstring picks the factor
    from exactly this number)."""
    o = t(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per_key.agg(
        bi(F.count(F.lit(1))).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("avg_cnt"),
    )
    from pyspark.sql import Window

    # top-10 via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # O(k) driver merge) BEFORE ranking — the rank window then runs over
    # exactly 10 rows, never over the key-cardinality aggregate
    top10 = per_key.orderBy(F.desc("cnt"), F.asc("key")).limit(10)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    top = top10.withColumn("rn", F.row_number().over(w))
    from ..functions.parity import r6

    return top.crossJoin(F.broadcast(stats)).select(
        bi(F.col("rn")).alias("rank"),
        F.col("key").alias("heavy_key"),
        F.col("cnt").alias("key_rows"),
        "n_keys",
        r6(F.col("max_cnt").cast("double") / F.col("avg_cnt")).alias("skew_factor"),
        r6(F.col("cnt").cast("double") / F.col("n_rows")).alias("share_of_rows"),
    )


@query(
    "profile_histogram_auto",
    oracle="""
    WITH stats AS (
      SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi,
             CAST(1 + floor(log2(count(*))) AS BIGINT) AS k
      FROM customer
    ),
    binned AS (
      SELECT CASE WHEN s.hi > s.lo
                  THEN least(CAST(floor((c_acctbal - s.lo) / ((s.hi - s.lo) / s.k)) AS BIGINT),
                             s.k - 1)
                  ELSE 0 END AS bin,
             s.lo, s.hi, s.k
      FROM customer CROSS JOIN stats s
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           round(lo + bin * ((hi - lo) / k), 6) AS bin_lo,
           round(lo + (bin + 1) * ((hi - lo) / k), 6) AS bin_hi
    FROM binned
    GROUP BY bin, lo, hi, k
    """,
)
def profile_histogram_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-binned numeric histogram — profile_table's distribution
    companion: bin count from Sturges' rule (1 + ⌊log₂ n⌋), bounds from
    one min/max/count pass, assignment a pure projection against the
    broadcast 1-row stats (agg_histogram_fixed is the constant-bin
    mergeable sibling; auto bins are data-dependent, hence the explicit
    two-pass shape — the stats pass is what makes the bin spec
    deterministic). Top bin closes the right edge (`least(..., k-1)`).
    Bin ids and counts are integer-exact; edges derive from identical
    (lo, hi, k) on both engines."""
    c = t(spark, sf_dir, "customer")
    stats = c.agg(
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        (1 + F.floor(F.log2(F.count(F.lit(1))))).cast("long").alias("k"),
    )
    width = (F.col("hi") - F.col("lo")) / F.col("k")
    # degenerate guard: a constant column makes width 0 and floor(0/0)
    # NaN→NULL on Spark while DuckDB's CAST(NaN AS BIGINT) raises — both
    # engines collapse to a single bin 0 instead.
    binned = c.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor((F.col("c_acctbal") - F.col("lo")) / width).cast("long"),
                F.col("k") - 1,
            ),
        ).otherwise(F.lit(0).cast("long")).alias("bin"),
        "lo",
        "hi",
        "k",
    )
    return binned.groupBy("bin", "lo", "hi", "k").agg(
        bi(F.count(F.lit(1))).alias("n")
    ).select(
        "bin",
        "n",
        F.round(F.col("lo") + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
    )
