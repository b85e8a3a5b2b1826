"""§2 round-6 batch CA — intermittent-demand forecasting, malformed-JSON
ingestion, and a skyline (Pareto frontier) operator.

- ``ts_croston_intermittent``: Croston's method over each part's demand
  events — TWO coupled exponential smoothers (demand size, inter-demand
  interval) folded in-row over the time-ordered event list with a STRUCT
  accumulator; DuckDB replays the identical fold via list_reduce, so the
  float trajectory (not just the tail) is certified. The standard
  forecaster for spare-parts / long-tail demand where most periods are
  zero.
- ``source_json_malformed``: PERMISSIVE-mode JSON ingestion of a feed
  with broken lines — good rows parse, bad rows land in
  ``_corrupt_record`` — and the good/bad split is value-oracled. The
  JSON twin of source_csv_malformed.
- ``part_skyline_pareto``: 2-D skyline (cheaper-is-better retail price ×
  bigger-is-better size): Spark computes it with the O(n log n)
  price-level running-max trick (two keyed windows, no self-join); the
  oracle is the QUADRATIC EXISTS definition of dominance — the hash
  certifies the fast plan implements the textbook semantics exactly,
  ties included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_ALPHA = 0.2
_MIN_DEMANDS = 3


@query(
    "ts_croston_intermittent",
    oracle=f"""
    WITH demand AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
             CAST(sum(l_quantity) AS DOUBLE) AS x
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey,
             list(struct_pack(d := d, x := x) ORDER BY d) AS ev
      FROM demand GROUP BY 1 HAVING count(*) >= {_MIN_DEMANDS}
    ),
    folded AS (
      SELECT l_partkey,
             len(ev) AS n_demands,
             list_reduce(ev, (acc, e) -> struct_pack(
               d := e.d,
               x := CAST({_ALPHA} * e.x + (1 - {_ALPHA}) * acc.x AS DOUBLE),
               p := CAST(CASE WHEN acc.p IS NULL
                         THEN date_diff('day', acc.d, e.d)
                         ELSE {_ALPHA} * date_diff('day', acc.d, e.d)
                              + (1 - {_ALPHA}) * acc.p END AS DOUBLE)
             )) AS st
      FROM (SELECT l_partkey,
                   list_transform(ev, e -> struct_pack(
                     d := e.d, x := CAST(e.x AS DOUBLE),
                     p := CAST(NULL AS DOUBLE))) AS ev
            FROM per_part)
    )
    SELECT l_partkey AS partkey,
           CAST(n_demands AS BIGINT) AS n_demands,
           round(st.x, 6) AS smoothed_size,
           round(st.p, 6) AS smoothed_interval_days,
           round(st.x / st.p, 6) AS croston_rate_per_day
    FROM folded
    """,
)
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per part (α = 0.2): demand
    SIZE smooths on every demand event, the INTER-DEMAND INTERVAL smooths
    on the day gaps, and the forecast rate is size/interval — the method
    of record when most periods have zero demand (naive EWMA of the raw
    series biases toward zero). State is a 3-field struct folded in-row
    over each part's date-ordered demand list: init z=x₁, p seeds on the
    first gap, exactly mirrored by the oracle's list_reduce — two engines
    run the SAME recurrence on the SAME floats. One groupBy to demand
    grain + one to the per-part list; the fold never shuffles."""
    li = t(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum("l_quantity").cast("double").alias("x"))
    per_part = (
        demand.groupBy("l_partkey")
        .agg(F.array_sort(F.collect_list(F.struct("d", "x"))).alias("ev"))
        .where(F.size("ev") >= _MIN_DEMANDS)
    )
    first = F.element_at("ev", 1)
    init = F.struct(
        first["d"].alias("d"),
        first["x"].alias("x"),
        F.lit(None).cast("double").alias("p"),
    )
    rest = F.slice(F.col("ev"), 2, F.greatest(F.size("ev") - 1, F.lit(0)))
    st = F.aggregate(
        rest,
        init,
        lambda acc, e: F.struct(
            e["d"].alias("d"),
            (_ALPHA * e["x"] + (1 - _ALPHA) * acc["x"]).alias("x"),
            F.when(
                acc["p"].isNull(),
                F.datediff(e["d"], acc["d"]).cast("double"),
            )
            .otherwise(
                _ALPHA * F.datediff(e["d"], acc["d"]).cast("double")
                + (1 - _ALPHA) * acc["p"]
            )
            .alias("p"),
        ),
    )
    return per_part.select(
        F.col("l_partkey").alias("partkey"),
        bi(F.size("ev")).alias("n_demands"),
        st.alias("st"),
    ).select(
        "partkey",
        "n_demands",
        r6(F.col("st.x")).alias("smoothed_size"),
        r6(F.col("st.p")).alias("smoothed_interval_days"),
        r6(F.col("st.x") / F.col("st.p")).alias("croston_rate_per_day"),
    )


@query(
    "source_json_malformed",
    oracle="""
    SELECT
      CAST(count(*) AS BIGINT) AS n_lines,
      CAST(sum(CASE WHEN o_orderkey % 10 != 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
      CAST(sum(CASE WHEN o_orderkey % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      CAST(sum(CASE WHEN o_orderkey % 10 != 3 THEN o_orderkey END) AS BIGINT)
        AS sum_good_ids,
      round(sum(CASE WHEN o_orderkey % 10 != 3 THEN round(o_totalprice, 2) END), 2)
        AS sum_good_price
    FROM orders
    """,
)
def source_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSON ingestion with real broken lines (every
    o_orderkey % 10 == 3 row is TRUNCATED mid-object): good rows parse
    to typed columns, bad rows carry their raw text in
    ``_corrupt_record`` with typed fields NULL — the production contract
    for dirty feeds (count them, quarantine them, never drop silently).
    The oracle rebuilds the same feed and certifies the good/bad split
    AND the typed sums over the surviving rows. JSON twin of
    source_csv_malformed; DROPMALFORMED/FAILFAST are the same reader
    option and are exercised in tests."""
    import os

    from .sources import _scratch

    path = _scratch(sf_dir, "json_malformed_feed")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o = t(spark, sf_dir, "orders")
        line = F.when(
            F.col("o_orderkey") % 10 == 3,
            F.concat(F.lit('{"id": '), F.col("o_orderkey"), F.lit(', "price": ')),
        ).otherwise(
            F.concat(
                F.lit('{"id": '),
                F.col("o_orderkey"),
                F.lit(', "price": '),
                F.round("o_totalprice", 2),
                F.lit("}"),
            )
        )
        o.select(line.alias("value")).write.mode("overwrite").text(path)
    parsed = spark.read.schema(
        "id bigint, price double, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count("id").cast("bigint").alias("n_good"),
        F.count("_corrupt_record").cast("bigint").alias("n_corrupt"),
        F.sum("id").cast("bigint").alias("sum_good_ids"),
        F.round(F.sum("price"), 2).alias("sum_good_price"),
    )


@query(
    "part_skyline_pareto",
    oracle="""
    SELECT p.p_partkey AS partkey,
           round(p.p_retailprice, 2) AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (retail price ↓ better, size ↑ better). Spark runs the O(n log n)
    form — a part is dominated iff the best size among STRICTLY cheaper
    parts is ≥ its size, or a SAME-price part has strictly larger size:
    one agg to price levels, one running max over the (distinct-price-
    sized) level table, one broadcast join back, one same-price window.
    No self-join, no quadratic pass. The oracle IS the quadratic EXISTS
    definition of dominance, so the hash certifies the fast plan's tie
    handling matches the textbook semantics exactly. At 100 TB the
    level table is ~|distinct prices| and the corpus passes once."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    from ..functions.ranks import with_global_running_max

    levels = p.groupBy("price").agg(F.max("size").alias("level_max"))
    # exclusive running max over price levels WITHOUT a single-partition
    # window: range-partitioned local maxes + broadcast prefix offsets
    # (distinct prices scale with the corpus — the audit's class-3 trap)
    levels = with_global_running_max(
        levels, [F.col("price")], "level_max", max_col="best_cheaper"
    )
    ws = Window.partitionBy("price")
    j = p.join(F.broadcast(levels.select("price", "best_cheaper")), "price")
    j = j.withColumn("same_price_max", F.max("size").over(ws))
    frontier = j.where(
        (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("size")))
        & (F.col("same_price_max") == F.col("size"))
    )
    return frontier.select(
        F.col("p_partkey").alias("partkey"),
        F.round("price", 2).alias("price"),
        bi(F.col("size")).alias("size"),
    )


# ------------------------------------------------------- round-6 batch CB


@query(
    "customer_survival_km",
    oracle="""
    WITH horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
    seq AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             lead(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS nxt
      FROM orders
    ),
    obs AS (
      SELECT CASE WHEN nxt IS NOT NULL
                  THEN date_diff('day', d, nxt)
                  ELSE date_diff('day', d, (SELECT h FROM horizon)) END AS days,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS event
      FROM seq
    ),
    weekly AS (
      SELECT CAST(floor(days / 7) AS BIGINT) AS tw,
             sum(event) AS d,
             sum(1 - event) AS c
      FROM obs GROUP BY 1
    ),
    risk AS (
      SELECT tw, d, c,
             (SELECT count(*) FROM obs)
             - coalesce(sum(d + c) OVER (
                 ORDER BY tw ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS n_risk
      FROM weekly
    )
    SELECT tw AS week,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           round(CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY tw ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) = 1 THEN 0
                 ELSE exp(sum(CASE WHEN d < n_risk
                              THEN ln(1 - CAST(d AS DOUBLE) / n_risk) END) OVER (
                   ORDER BY tw ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 )) END, 6) AS survival
    FROM risk WHERE d > 0
    """,
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier repurchase-survival curve: each order-to-next-order
    gap is an observed event, the tail after a customer's LAST order is
    RIGHT-CENSORED at the dataset horizon — dropping censored intervals
    (the naive mistake) biases survival down, and the oracle certifies
    the censoring arithmetic. Week grain: risk set n_i = total − (events
    + censored before week i), S = Π(1 − dᵢ/nᵢ) computed as exp(Σ ln ·)
    — both engines run the identical product-as-logsum. The week table
    is calendar-bounded (§R class 3 window), the corpus passes are one
    keyed lead window + one agg."""
    from ..functions.parity import um  # noqa: F401  (keeps import style uniform)

    o = t(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.to_date("o_orderdate").alias("d"),
        F.lead(F.to_date("o_orderdate")).over(w).alias("nxt"),
    ).crossJoin(F.broadcast(horizon))
    obs = seq.select(
        F.when(
            F.col("nxt").isNotNull(), F.datediff("nxt", "d")
        ).otherwise(F.datediff("h", "d")).alias("days"),
        F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("event"),
    )
    weekly = obs.groupBy(F.floor(F.col("days") / 7).cast("bigint").alias("tw")).agg(
        F.sum("event").alias("d"), F.sum(1 - F.col("event")).alias("c")
    )
    total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    wt = Window.orderBy("tw").rowsBetween(Window.unboundedPreceding, -1)
    wrun = Window.orderBy("tw").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = (
        weekly.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wt), F.lit(0)),
        )
        .withColumn(
            "_zero_seen",
            F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(wrun),
        )
        .withColumn(
            "survival_raw",
            # S hits exactly 0 once a week's events exhaust the risk set;
            # ln() must skip that term (both engines error/−inf on ln(0))
            F.when(F.col("_zero_seen") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d") < F.col("n_risk"),
                            F.log(1 - F.col("d").cast("double") / F.col("n_risk")),
                        )
                    ).over(wrun)
                )
            ),
        )
    )
    return risk.where(F.col("d") > 0).select(
        F.col("tw").alias("week"),
        bi(F.col("n_risk")).alias("n_at_risk"),
        bi(F.col("d")).alias("n_events"),
        bi(F.col("c")).alias("n_censored"),
        r6(F.col("survival_raw")).alias("survival"),
    )


@query(
    "sql_table_function",
    oracle="""
    SELECT n.n_nationkey AS nationkey, t.bucket AS bucket, t.ub AS ub
    FROM nation n, (SELECT 0 AS bucket, 8 AS ub UNION ALL
                    SELECT 1, 16 UNION ALL SELECT 2, 24 UNION ALL
                    SELECT 3, 32) t
    WHERE n.n_nationkey < t.ub AND n.n_nationkey >= t.ub - 8
    """,
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE FUNCTION (Spark 4 `CREATE TEMPORARY FUNCTION … RETURNS
    TABLE … RETURN SELECT`) applied per row via LATERAL — the
    SQL-native UDTF surface next to the Python UDTFs (§2-L): the
    function maps a nation key to its 8-wide bucket row. The oracle
    re-expresses the lateral apply as a plain join, so the hash
    certifies the function's per-row semantics. Catalyst inlines the
    function body — the plan is the same join you would write by hand,
    no Python boundary at all."""
    n = t(spark, sf_dir, "nation")
    n.createOrReplaceTempView("sql_tf_nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION nation_bucket(k INT)
        RETURNS TABLE (bucket INT, ub INT)
        RETURN SELECT CAST(floor(k / 8) AS INT), CAST((floor(k / 8) + 1) * 8 AS INT)
        """
    )
    return spark.sql(
        """
        SELECT n.n_nationkey AS nationkey, t.bucket AS bucket, t.ub AS ub
        FROM sql_tf_nation n, LATERAL nation_bucket(n.n_nationkey) t
        """
    )
