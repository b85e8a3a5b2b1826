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
