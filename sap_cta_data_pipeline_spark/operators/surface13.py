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
    # price-level table is scale-growing (distinct prices grow with the
    # corpus) — no forced broadcast; AQE decides (round-8 sweep, S17)
    j = p.join(levels.select("price", "best_cheaper"), "price")
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


@query(
    "ml_ols_two_feature",
    oracle="""
    WITH feat AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DOUBLE) AS y,
             CAST(count(*) AS DOUBLE) AS x1,
             CAST(sum(l.l_quantity) AS DOUBLE) AS x2
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    s AS (
      SELECT count(*) AS n,
             avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
             sum(x1 * x1) AS s11r, sum(x2 * x2) AS s22r,
             sum(x1 * x2) AS s12r, sum(x1 * y) AS s1yr,
             sum(x2 * y) AS s2yr, sum(y * y) AS syyr
      FROM feat
    ),
    coef AS (
      SELECT n, m1, m2, my,
             (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2,
             syy
      FROM (
        SELECT n, m1, m2, my,
               s11r - n * m1 * m1 AS s11, s22r - n * m2 * m2 AS s22,
               s12r - n * m1 * m2 AS s12, s1yr - n * m1 * my AS s1y,
               s2yr - n * m2 * my AS s2y, syyr - n * my * my AS syy
        FROM s
      )
    ),
    resid AS (
      SELECT c.n, c.b1, c.b2, c.my - c.b1 * c.m1 - c.b2 * c.m2 AS intercept,
             c.syy,
             sum(pow(f.y - (c.my - c.b1 * c.m1 - c.b2 * c.m2)
                     - c.b1 * f.x1 - c.b2 * f.x2, 2)) AS sse
      FROM feat f CROSS JOIN coef c
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(b1, 6) AS beta_n_items,
           round(b2, 6) AS beta_sum_qty,
           round(intercept, 6) AS intercept,
           round(1 - sse / syy, 6) AS r2
    FROM resid
    """,
)
def ml_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS by explicit normal equations — predict an order's
    total price from its line count and summed quantity: centered cross
    sums from ONE aggregate pass, the 2×2 system solved in closed form,
    then ONE residual pass (coefficients broadcast as a 1-row frame) for
    R². This is how regression actually distributes: sufficient
    statistics are a map-side-combinable agg, the solve is O(p³) driver
    math (p=2), and no iteration touches the corpus — the normal-
    equation shape every MLlib linear model reduces to for small p.
    Fully value-oracled including R² (both engines run the identical
    algebra on the identical doubles)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    feat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x1"),
            F.sum("l_quantity").cast("double").alias("x2"),
        )
        .select(F.col("o_totalprice").cast("double").alias("y"), "x1", "x2")
    )
    s = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11r"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22r"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12r"),
        F.sum(F.col("x1") * F.col("y")).alias("s1yr"),
        F.sum(F.col("x2") * F.col("y")).alias("s2yr"),
        F.sum(F.col("y") * F.col("y")).alias("syyr"),
    )
    cent = s.select(
        "n", "m1", "m2", "my",
        (F.col("s11r") - F.col("n") * F.col("m1") * F.col("m1")).alias("s11"),
        (F.col("s22r") - F.col("n") * F.col("m2") * F.col("m2")).alias("s22"),
        (F.col("s12r") - F.col("n") * F.col("m1") * F.col("m2")).alias("s12"),
        (F.col("s1yr") - F.col("n") * F.col("m1") * F.col("my")).alias("s1y"),
        (F.col("s2yr") - F.col("n") * F.col("m2") * F.col("my")).alias("s2y"),
        (F.col("syyr") - F.col("n") * F.col("my") * F.col("my")).alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    coef = cent.select(
        "n", "m1", "m2", "my", "syy",
        ((F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det).alias("b1"),
        ((F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det).alias("b2"),
    ).withColumn(
        "intercept", F.col("my") - F.col("b1") * F.col("m1") - F.col("b2") * F.col("m2")
    )
    resid = feat.crossJoin(F.broadcast(coef)).agg(
        F.max("n").alias("n"),
        F.max("b1").alias("b1"),
        F.max("b2").alias("b2"),
        F.max("intercept").alias("intercept"),
        F.max("syy").alias("syy"),
        F.sum(
            F.pow(
                F.col("y")
                - F.col("intercept")
                - F.col("b1") * F.col("x1")
                - F.col("b2") * F.col("x2"),
                2,
            )
        ).alias("sse"),
    )
    return resid.select(
        F.col("n").cast("bigint").alias("n_orders"),
        r6(F.col("b1")).alias("beta_n_items"),
        r6(F.col("b2")).alias("beta_sum_qty"),
        r6(F.col("intercept")).alias("intercept"),
        r6(1 - F.col("sse") / F.col("syy")).alias("r2"),
    )


@query(
    "emb_outlier_mahalanobis",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    dims AS (
      SELECT i, avg(e[i]) AS mu, var_pop(e[i]) AS sg
      FROM v, range(1, 65) t(i) GROUP BY i
    ),
    stats AS (
      SELECT list(mu ORDER BY i) AS mus, list(sg ORDER BY i) AS sgs FROM dims
    ),
    scored AS (
      SELECT v.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> pow(v.e[i] - s.mus[i], 2) / s.sgs[i])) AS d2
      FROM v CROSS JOIN stats s
    )
    SELECT vec_id, round(d2, 6) AS mahalanobis_d2,
           CAST(row_number() OVER (ORDER BY d2 DESC, vec_id) AS BIGINT) AS rnk
    FROM scored
    ORDER BY d2 DESC, vec_id LIMIT 20
    """,
)
def emb_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier screen by diagonal Mahalanobis distance — the
    corpus-hygiene pass run before any embedding-based dedup/clustering
    (a handful of far-out vectors poison centroids and recall evals):
    per-dimension mean/variance from ONE posexplode agg (64 rows),
    collapsed to a single broadcast row; each vector's distance is an
    in-row fold (zero shuffle on the corpus branch); top-20 reported.
    Diagonal covariance is the deliberate scale choice — the full
    Σ⁻¹ needs a d×d solve (emb_covariance_block has the blocks), while
    the diagonal screen is one pass and catches magnitude/axis outliers,
    which is what corrupt embeddings look like."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    dims = (
        emb.select(F.posexplode("e").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("mu"), F.var_pop("x").alias("sg"))
    )
    stats = dims.agg(
        F.array_sort(F.collect_list(F.struct("i", "mu", "sg"))).alias("pairs")
    ).select(
        F.transform("pairs", lambda p: p["mu"]).alias("mus"),
        F.transform("pairs", lambda p: p["sg"]).alias("sgs"),
    )
    scored = emb.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(63)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.pow(
                F.element_at("e", i.cast("int") + 1)
                - F.element_at("mus", i.cast("int") + 1),
                2,
            )
            / F.element_at("sgs", i.cast("int") + 1),
        ).alias("d2"),
    )
    w = Window.orderBy(F.col("d2").desc(), F.col("vec_id"))
    return (
        scored.orderBy(F.col("d2").desc(), "vec_id")
        .limit(20)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select("vec_id", r6(F.col("d2")).alias("mahalanobis_d2"), "rnk")
    )


@query(
    "orders_queue_backlog_lindley",
    oracle="""
    WITH arr AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS a
      FROM orders GROUP BY 1
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM arr),
    days AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    cal AS (
      SELECT d.day, coalesce(a.a, 0) AS a
      FROM days d LEFT JOIN arr a ON a.day = d.day
    ),
    cap AS (SELECT ceil(avg(a)) AS c FROM cal),
    s AS (
      SELECT day, a,
             sum(a - (SELECT c FROM cap)) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM cal
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(a AS BIGINT) AS arrivals,
           CAST(cum - least(0, min(cum) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS BIGINT) AS backlog
    FROM s
    """,
)
def orders_queue_backlog_lindley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue backlog under fixed daily service capacity — the Lindley
    recursion q_d = max(0, q_{d−1} + a_d − c), which is NON-linear (the
    clamp) and so has no direct window form... except via the classical
    identity q_d = s_d − min(0, min_{j≤d} s_j) where s is the UNclamped
    running sum of (a − c): one cumulative-sum window plus one
    running-min window recovers the whole clamped trajectory — the
    transformation that turns a sequential simulation into two
    day-grain windows (§R class 3, calendar-bounded). Capacity c =
    ceil(mean daily arrivals) over the gap-FILLED calendar (missing
    days must serve, not skip — the day axis is generated, not
    observed). The operations answer: how deep does the backlog get
    when the system runs at its average load."""
    o = t(spark, sf_dir, "orders")
    arr = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("a")
    )
    span = arr.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    cal = days.join(arr, "day", "left").select(
        "day", F.coalesce("a", F.lit(0)).alias("a")
    )
    cap = cal.agg(F.ceil(F.avg("a")).alias("c"))
    wrun = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = cal.crossJoin(F.broadcast(cap)).withColumn(
        "cum", F.sum(F.col("a") - F.col("c")).over(wrun)
    )
    return s.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("a")).alias("arrivals"),
        (F.col("cum") - F.least(F.lit(0).cast("long"), F.min("cum").over(wrun)))
        .cast("bigint")
        .alias("backlog"),
    )


@query(
    "events_funnel_conversion_window",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND epoch_us(e.ts) - epoch_us(s1.t1) <= 7 * 86400000000
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND epoch_us(e.ts) - epoch_us(s2.t2) <= 7 * 86400000000
      GROUP BY 1
    )
    SELECT
      CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_step1_view,
      CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_step2_click_7d,
      CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_step3_purchase_7d,
      round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
            / (SELECT count(*) FROM s1), 6) AS conv_1_to_2,
      round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
            / nullif((SELECT count(*) FROM s2), 0), 6) AS conv_2_to_3
    """,
)
def events_funnel_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with a CONVERSION WINDOW — each step must land within 7
    days of the previous step's first qualifying event (the unbounded
    funnel, events_funnel_steps, overstates conversion by crediting
    arbitrarily-late steps; every product-analytics funnel defaults to a
    window). Same step-N-joins-step-N−1-survivors shape — user-keyed
    min aggregates, filters pushed to each scan — plus the window bound
    as a residual predicate; emits step counts and step-over-step
    conversion rates."""
    from ..functions.parity import um

    e = t(spark, sf_dir, "events")
    week_us = 7 * 86_400_000_000
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (um("ts") - um("t1") <= week_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (um("ts") - um("t2") <= week_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n3"))
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .select(
            F.col("n1").cast("bigint").alias("n_step1_view"),
            F.col("n2").cast("bigint").alias("n_step2_click_7d"),
            F.col("n3").cast("bigint").alias("n_step3_purchase_7d"),
            r6(F.col("n2").cast("double") / F.col("n1")).alias("conv_1_to_2"),
            r6(
                F.col("n3").cast("double") / F.nullif(F.col("n2"), F.lit(0))
            ).alias("conv_2_to_3"),
        )
    )


@query(
    "fn_ipv4_cidr_match",
    oracle="""
    WITH ips AS (
      SELECT user_id,
             ((user_id * 2654435761) % 4294967296) AS ip
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cidr AS (
      SELECT * FROM (VALUES
        ('10.0.0.0/8',     167772160, 8),
        ('172.16.0.0/12',  2886729728, 12),
        ('192.168.0.0/16', 3232235520, 16),
        ('0.0.0.0/2',      0, 2),
        ('128.0.0.0/3',    2147483648, 3)
      ) t(block, base, prefix)
    )
    SELECT c.block AS block,
           CAST(count(i.user_id) AS BIGINT) AS n_users,
           CAST(min(i.user_id) AS BIGINT) AS min_user,
           CAST(max(i.user_id) AS BIGINT) AS max_user
    FROM cidr c
    LEFT JOIN ips i
      ON CAST(floor(i.ip / pow(2, 32 - c.prefix)) AS BIGINT)
         = CAST(floor(c.base / pow(2, 32 - c.prefix)) AS BIGINT)
    GROUP BY 1
    """,
)
def fn_ipv4_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 CIDR containment — the security-analytics join (which users
    fall in which network blocks): synthetic per-user IPs (deterministic
    multiplicative hash), a 5-block CIDR dim, and membership by
    prefix arithmetic — ip >> (32−prefix) == base >> (32−prefix) — not
    string manipulation. The dim broadcasts (CIDR tables are always
    dim-sized); per-block membership is a residual predicate on the
    broadcast join, so the user set streams once for all blocks. Counts
    + id ranges per block are fully oracled."""
    e = t(spark, sf_dir, "events")
    ips = e.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 2654435761) % F.lit(4294967296)).alias("ip"),
    )
    cidr = spark.createDataFrame(
        [
            ("10.0.0.0/8", 167772160, 8),
            ("172.16.0.0/12", 2886729728, 12),
            ("192.168.0.0/16", 3232235520, 16),
            ("0.0.0.0/2", 0, 2),
            ("128.0.0.0/3", 2147483648, 3),
        ],
        "block string, base long, prefix int",
    )
    shift = F.pow(F.lit(2.0), 32 - F.col("prefix"))
    j = F.broadcast(cidr).join(
        ips,
        F.floor(F.col("ip") / shift).cast("long")
        == F.floor(F.col("base") / shift).cast("long"),
        "left",
    )
    return j.groupBy("block").agg(
        F.count("user_id").cast("bigint").alias("n_users"),
        F.min("user_id").cast("bigint").alias("min_user"),
        F.max("user_id").cast("bigint").alias("max_user"),
    )


@query(
    "events_ab_cuped",
    oracle="""
    WITH mid AS (
      SELECT CAST(min(epoch_us(ts)) AS DOUBLE)
             + (CAST(max(epoch_us(ts)) AS DOUBLE)
                - CAST(min(epoch_us(ts)) AS DOUBLE)) / 2 AS m
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             user_id % 2 = 1 AS treated,
             avg(CASE WHEN CAST(epoch_us(ts) AS DOUBLE) < (SELECT m FROM mid)
                      THEN value END) AS x_pre,
             avg(CASE WHEN CAST(epoch_us(ts) AS DOUBLE) >= (SELECT m FROM mid)
                      THEN value END) AS y_post
      FROM events GROUP BY 1, 2
    ),
    both_p AS (
      SELECT * FROM per_user WHERE x_pre IS NOT NULL AND y_post IS NOT NULL
    ),
    theta AS (
      SELECT covar_samp(x_pre, y_post) / var_samp(x_pre) AS th,
             avg(x_pre) AS mx
      FROM both_p
    )
    SELECT b.treated AS treated,
           CAST(count(*) AS BIGINT) AS n_users,
           round(t.th, 6) AS theta,
           round(avg(b.y_post), 6) AS mean_y,
           round(var_samp(b.y_post), 6) AS var_y,
           round(avg(b.y_post - t.th * (b.x_pre - t.mx)), 6) AS mean_y_cuped,
           round(var_samp(b.y_post - t.th * (b.x_pre - t.mx)), 6) AS var_y_cuped,
           round(1 - var_samp(b.y_post - t.th * (b.x_pre - t.mx))
                     / var_samp(b.y_post), 6) AS var_reduction
    FROM both_p b CROSS JOIN theta t
    GROUP BY b.treated, t.th, t.mx
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, the standard
    experimentation-platform adjustment): each user's PRE-period mean is
    the control covariate for their post-period metric — Y' = Y −
    θ(X − X̄), θ = cov(X,Y)/var(X) pooled across arms (pooling keeps the
    adjustment unbiased for the treatment effect). Emits per-arm raw vs
    adjusted mean/variance and the realized variance-reduction fraction —
    the number that decides how much traffic the platform saves. Shapes:
    one user-grain conditional rollup (pre/post in ONE pass over events,
    no second scan), a 1-row θ broadcast, one per-arm agg."""
    from ..functions.parity import um

    e = t(spark, sf_dir, "events")
    mid = e.agg(
        (
            um(F.min("ts")).cast("double")
            + (um(F.max("ts")).cast("double") - um(F.min("ts")).cast("double")) / 2
        ).alias("m")
    )
    per_user = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id", (F.col("user_id") % 2 == 1).alias("treated"))
        .agg(
            F.avg(
                F.when(um("ts").cast("double") < F.col("m"), F.col("value"))
            ).alias("x_pre"),
            F.avg(
                F.when(um("ts").cast("double") >= F.col("m"), F.col("value"))
            ).alias("y_post"),
        )
        .where(F.col("x_pre").isNotNull() & F.col("y_post").isNotNull())
    )
    theta = per_user.agg(
        (F.covar_samp("x_pre", "y_post") / F.var_samp("x_pre")).alias("th"),
        F.avg("x_pre").alias("mx"),
    )
    adj = F.col("y_post") - F.col("th") * (F.col("x_pre") - F.col("mx"))
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("treated", "th", "mx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            r6(F.max("th")).alias("theta"),
            r6(F.avg("y_post")).alias("mean_y"),
            r6(F.var_samp("y_post")).alias("var_y"),
            r6(F.avg(adj)).alias("mean_y_cuped"),
            r6(F.var_samp(adj)).alias("var_y_cuped"),
            r6(1 - F.var_samp(adj) / F.var_samp("y_post")).alias("var_reduction"),
        )
        .drop("th", "mx")
    )
