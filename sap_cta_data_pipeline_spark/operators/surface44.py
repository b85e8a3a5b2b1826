"""§2 round-9 batch FM — supply-chain demand classification + statistical
process control.

``part_demand_classification``: the Syntetos-Boylan demand-pattern
quadrants (smooth / intermittent / erratic / lumpy) from per-part
monthly demand: ADI (average inter-demand interval = months / months-
with-demand) vs CV² of nonzero demand sizes, cut at the published
(1.32, 0.49) thresholds — the classifier that decides WHICH forecast
model (Croston vs SES vs ...) each SKU gets. Per-part ratios come from
integer sums; the per-class means aggregate DECIMAL-quantized values so
no cross-row float sum exists.

``stats_spc_xbar_r``: the X̄-R control chart (subgroup size 5, the
textbook Shewhart configuration): per-day subgroups of the first five
orders, exact integer subgroup sums/ranges, grand limits
X̿ ± A₂·R̄ and D₄·R̄ with the published n=5 constants (A₂=0.577,
D₄=2.114), and the out-of-control days flagged by rule (X / R / XR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_ADI_CUT = 1.32
_CV2_CUT = 0.49


@query(
    "part_demand_classification",
    oracle=f"""
    WITH d AS (
      SELECT l_partkey,
             date_trunc('month', l_shipdate) AS m,
             CAST(round(sum(l_quantity), 0) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    mm AS (SELECT count(DISTINCT m) AS months FROM d),
    per AS (
      SELECT l_partkey, count(*) AS n_nz,
             sum(q) AS s, sum(q * q) AS qq
      FROM d GROUP BY l_partkey
    ),
    scored AS (
      SELECT l_partkey,
             CAST(mm.months AS DOUBLE) / n_nz AS adi,
             (CAST(qq AS DOUBLE) / n_nz
              - (CAST(s AS DOUBLE) / n_nz) * (CAST(s AS DOUBLE) / n_nz))
             / ((CAST(s AS DOUBLE) / n_nz) * (CAST(s AS DOUBLE) / n_nz))
               AS cv2
      FROM per, mm
    ),
    classed AS (
      SELECT CASE
               WHEN adi < {_ADI_CUT} AND cv2 < {_CV2_CUT} THEN 'smooth'
               WHEN adi >= {_ADI_CUT} AND cv2 < {_CV2_CUT} THEN 'intermittent'
               WHEN adi < {_ADI_CUT} AND cv2 >= {_CV2_CUT} THEN 'erratic'
               ELSE 'lumpy'
             END AS demand_class,
             CAST(round(adi, 6) AS DECIMAL(18,6)) AS adi6,
             CAST(round(cv2, 6) AS DECIMAL(18,6)) AS cv26
      FROM scored
    )
    SELECT demand_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(adi6) AS DOUBLE) / count(*), 6) AS avg_adi,
           round(CAST(sum(cv26) AS DOUBLE) / count(*), 6) AS avg_cv2
    FROM classed GROUP BY demand_class
    """,
)
def part_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan quadrants over per-part monthly demand: ADI from
    the global month count vs months-with-demand, CV² from integer
    size sums (population variance over mean², both engines build the
    ratio from the same casts), classes cut at (1.32, 0.49), per-class
    means of DECIMAL-quantized scores (order-proof). Planted pins: a
    steady 1-unit-every-month part is smooth (ADI=1, CV²=0); a part
    hit once in many months is lumpy/intermittent by construction.

    Scale: one (part, month) rollup + one part-grain agg + a 4-row
    class fold — the orders_seasonality_index envelope; the classifier
    is what routes each of millions of SKUs to its forecast family."""
    li = t(spark, sf_dir, "lineitem")
    d = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.round(F.sum("l_quantity"), 0).cast("long").alias("q"))
    mm = d.agg(F.countDistinct("m").alias("months"))
    per = d.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_nz"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    mean = F.col("s").cast("double") / F.col("n_nz")
    cv2 = (
        (F.col("qq").cast("double") / F.col("n_nz") - mean * mean)
        / (mean * mean)
    )
    scored = per.crossJoin(F.broadcast(mm)).select(
        "l_partkey",
        (F.col("months").cast("double") / F.col("n_nz")).alias("adi"),
        cv2.alias("cv2"),
    )
    classed = scored.select(
        F.when(
            (F.col("adi") < _ADI_CUT) & (F.col("cv2") < _CV2_CUT), "smooth"
        )
        .when(
            (F.col("adi") >= _ADI_CUT) & (F.col("cv2") < _CV2_CUT),
            "intermittent",
        )
        .when(
            (F.col("adi") < _ADI_CUT) & (F.col("cv2") >= _CV2_CUT), "erratic"
        )
        .otherwise("lumpy")
        .alias("demand_class"),
        F.round(F.col("adi"), 6).cast("decimal(18,6)").alias("adi6"),
        F.round(F.col("cv2"), 6).cast("decimal(18,6)").alias("cv26"),
    )
    return classed.groupBy("demand_class").agg(
        bi(F.count(F.lit(1))).alias("n_parts"),
        r6(
            F.sum("adi6").cast("double") / F.count(F.lit(1))
        ).alias("avg_adi"),
        r6(
            F.sum("cv26").cast("double") / F.count(F.lit(1))
        ).alias("avg_cv2"),
    )


_N_SUB = 5
_A2 = 0.577
_D4 = 2.114


@query(
    "stats_spc_xbar_r",
    oracle=f"""
    WITH sub AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             row_number() OVER (
               PARTITION BY date_trunc('day', o_orderdate)
               ORDER BY o_orderkey) AS rn
      FROM orders
    ),
    grp AS (
      SELECT day, sum(v) AS sc, max(v) - min(v) AS r, count(*) AS k
      FROM sub WHERE rn <= {_N_SUB} GROUP BY day
      HAVING count(*) = {_N_SUB}
    ),
    grand AS (
      SELECT sum(sc) AS ssc, sum(r) AS sr, count(*) AS d FROM grp
    ),
    lim AS (
      SELECT CAST(ssc AS DOUBLE) / ({_N_SUB} * d) AS xbb,
             CAST(sr AS DOUBLE) / d AS rbar,
             d
      FROM grand
    ),
    flagged AS (
      SELECT grp.day,
             CAST(grp.sc AS DOUBLE) / {_N_SUB} AS xbar,
             CAST(grp.r AS DOUBLE) AS r,
             (CAST(grp.sc AS DOUBLE) / {_N_SUB}
                > lim.xbb + {_A2} * lim.rbar
              OR CAST(grp.sc AS DOUBLE) / {_N_SUB}
                < lim.xbb - {_A2} * lim.rbar) AS x_out,
             (CAST(grp.r AS DOUBLE) > {_D4} * lim.rbar) AS r_out
      FROM grp, lim
    )
    SELECT CAST(day AS VARCHAR) AS day,
           round(xbar / 100.0, 6) AS xbar,
           round(r / 100.0, 6) AS r_range,
           CASE WHEN x_out AND r_out THEN 'XR'
                WHEN x_out THEN 'X'
                WHEN r_out THEN 'R' ELSE 'OK' END AS rule
    FROM flagged
    """,
)
def stats_spc_xbar_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X̄-R Shewhart chart on daily order-price subgroups (first five
    orders per day by key — a deterministic rational subgroup): exact
    integer subgroup sums and ranges, grand limits X̿ ± A₂R̄ / D₄R̄
    with the published n=5 constants, and the FULL chart emitted — every
    subgroup day with its violated rule or 'OK' (so the oracle hashes
    real values even on an in-control process). Planted pins: an
    in-control constant process is all-OK; one spiked day flags X (and
    R when the spike is within-subgroup).

    Scale: one day-partitioned rank (subgroup pick), one day-grain agg,
    a 1-row limits broadcast, one filter — the SPC sweep is two passes
    regardless of volume."""
    o = t(spark, sf_dir, "orders")
    wday = Window.partitionBy(
        F.date_trunc("day", "o_orderdate")
    ).orderBy("o_orderkey")
    sub = o.select(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.row_number().over(wday).alias("rn"),
    ).filter(F.col("rn") <= _N_SUB)
    grp = (
        sub.groupBy("day")
        .agg(
            F.sum("v").alias("sc"),
            (F.max("v") - F.min("v")).alias("r"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == _N_SUB)
    )
    grand = grp.agg(
        F.sum("sc").alias("ssc"), F.sum("r").alias("sr"), F.count(F.lit(1)).alias("d")
    )
    lim = grand.select(
        (F.col("ssc").cast("double") / (_N_SUB * F.col("d"))).alias("xbb"),
        (F.col("sr").cast("double") / F.col("d")).alias("rbar"),
    )
    xbar = F.col("sc").cast("double") / _N_SUB
    rr = F.col("r").cast("double")
    flagged = grp.crossJoin(F.broadcast(lim)).select(
        "day",
        xbar.alias("xbar"),
        rr.alias("rv"),
        (
            (xbar > F.col("xbb") + _A2 * F.col("rbar"))
            | (xbar < F.col("xbb") - _A2 * F.col("rbar"))
        ).alias("x_out"),
        (rr > _D4 * F.col("rbar")).alias("r_out"),
    )
    return flagged.select(
        F.col("day").cast("string").alias("day"),
        r6(F.col("xbar") / 100.0).alias("xbar"),
        r6(F.col("rv") / 100.0).alias("r_range"),
        F.when(F.col("x_out") & F.col("r_out"), "XR")
        .when(F.col("x_out"), "X")
        .when(F.col("r_out"), "R")
        .otherwise("OK")
        .alias("rule"),
    )
