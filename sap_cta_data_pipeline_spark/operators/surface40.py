"""§2 round-9 batch FI — quantile-forecast evaluation + community
quality.

``ml_pinball_loss_eval``: the pinball (quantile) loss — THE proper
scoring rule for quantile forecasts (newsvendor stocking, SLA latency
targets, demand bands): per event type, train-half value quantiles at
τ ∈ {0.1, 0.5, 0.9} predict the test half, and the loss
L_τ(y,q) = τ(y−q)⁺ + (1−τ)(q−y)⁺ averages per (type, τ). Everything is
INTEGER until the final division: values quantize to cents, quantiles
are lower (type-1) selections at the value grain (k = ⌈τn⌉ via the
integer (τ₁₀·n+9)÷10 — no 0.1-binary-float anywhere), and the loss is
×10-scaled integer cents.

``graph_modularity``: Newman modularity of the co-purchase graph under
the part-BRAND partition — "do brands form real communities?":
Q = Σ_c e_c/m − Σ_c (d_c/2m)², assembled from exact integer sufficient
statistics (intra-community edge count A and the degree-sum squares B),
so Q = A/m − B/(4m²) in one fixed-order expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .graph_ops import _EDGE_CTE, _edges

_CUT = "2024-01-16"
_TAUS = (1, 5, 9)  # τ·10


@query(
    "ml_pinball_loss_eval",
    oracle=f"""
    WITH x AS (
      SELECT event_type AS typ,
             CAST(round(value * 100, 0) AS BIGINT) AS v,
             (ts >= TIMESTAMP '{_CUT}') AS is_test
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT typ, v, count(*) AS cnt FROM x WHERE NOT is_test GROUP BY typ, v
    ),
    cum AS (
      SELECT typ, v,
             sum(cnt) OVER (PARTITION BY typ ORDER BY v) AS cum,
             sum(cnt) OVER (PARTITION BY typ) AS n
      FROM cells
    ),
    taus AS (SELECT t10 FROM (VALUES (1), (5), (9)) t(t10)),
    q AS (
      SELECT typ, t10, min(v) AS qv
      FROM cum, taus
      WHERE cum >= (t10 * n + 9) // 10
      GROUP BY typ, t10
    ),
    loss AS (
      SELECT x.typ, q.t10, q.qv,
             CASE WHEN x.v >= q.qv THEN (x.v - q.qv) * q.t10
                  ELSE (q.qv - x.v) * (10 - q.t10) END AS l10
      FROM x JOIN q ON x.typ = q.typ
      WHERE x.is_test
    )
    SELECT typ AS event_type,
           round(t10 / 10.0, 6) AS tau,
           round(any_value(qv) / 100.0, 6) AS q_tau,
           CAST(count(*) AS BIGINT) AS n_test,
           round(CAST(sum(l10) AS DOUBLE) / (count(*) * 1000.0), 6)
             AS avg_pinball
    FROM loss GROUP BY typ, t10
    """,
)
def ml_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss evaluation of per-type train-half value quantiles on
    the test half (τ = 0.1/0.5/0.9): cent-quantized values, lower
    quantiles selected at the value grain (cum counts ≥ the integer
    ⌈τn⌉), ×10-integer losses, one double division per (type, τ) row.
    Closed-form pin: under absolute loss the τ=0.5 quantile (median) is
    optimal, so its pinball loss ≤ either other τ's loss evaluated at
    the SAME τ=0.5 target — and a planted asymmetric frame pins the
    exact loss values.

    Scale: one train-half cell agg, a per-type value-grain cumulative
    window (the documented cent pre-binning route — §R value-grain
    family, partitioned by type), a ≤|types|·3-row quantile frame
    broadcast to the test scan, one final agg. No row-level ranks."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit(_CUT).cast("timestamp")
    x = e.select(
        F.col("event_type").alias("typ"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        (F.col("ts") >= cut).alias("is_test"),
    )
    cells = (
        x.filter(~F.col("is_test"))
        .groupBy("typ", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("typ").orderBy("v")
    wall = Window.partitionBy("typ")
    cum = cells.select(
        "typ",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    taus = spark.createDataFrame([(k,) for k in _TAUS], "t10 int")
    q = (
        cum.crossJoin(F.broadcast(taus))
        .filter(
            F.col("cum")
            >= F.floor((F.col("t10") * F.col("n") + 9) / 10).cast("long")
        )
        .groupBy("typ", "t10")
        .agg(F.min("v").alias("qv"))
    )
    loss = (
        x.filter(F.col("is_test"))
        .join(F.broadcast(q), "typ")
        .select(
            "typ",
            "t10",
            "qv",
            F.when(
                F.col("v") >= F.col("qv"),
                (F.col("v") - F.col("qv")) * F.col("t10"),
            )
            .otherwise((F.col("qv") - F.col("v")) * (10 - F.col("t10")))
            .alias("l10"),
        )
    )
    return loss.groupBy("typ", "t10").agg(
        F.any_value(F.col("qv")).alias("qv"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum("l10").alias("sl"),
    ).select(
        F.col("typ").alias("event_type"),
        r6(F.col("t10") / 10.0).alias("tau"),
        r6(F.col("qv") / 100.0).alias("q_tau"),
        bi(F.col("n_test")).alias("n_test"),
        r6(
            F.col("sl").cast("double") / (F.col("n_test") * 1000.0)
        ).alias("avg_pinball"),
    )


@query(
    "graph_modularity",
    oracle=f"""
    WITH {_EDGE_CTE},
    bru AS (SELECT p_partkey, p_brand FROM part),
    tagged AS (
      SELECT e.u, e.v, a.p_brand AS bu, b.p_brand AS bv
      FROM e JOIN bru a ON e.u = a.p_partkey
             JOIN bru b ON e.v = b.p_partkey
    ),
    m AS (SELECT count(*) AS m,
                 sum(CASE WHEN bu = bv THEN 1 ELSE 0 END) AS intra
          FROM tagged),
    degs AS (
      SELECT node, brand, count(*) AS deg FROM (
        SELECT u AS node, bu AS brand FROM tagged
        UNION ALL
        SELECT v AS node, bv AS brand FROM tagged
      ) GROUP BY node, brand
    ),
    comm AS (
      SELECT brand, sum(deg) AS d_c FROM degs GROUP BY brand
    ),
    b AS (SELECT sum(d_c * d_c) AS b2, count(*) AS k FROM comm)
    SELECT CAST(m.m AS BIGINT) AS m_edges,
           CAST(m.intra AS BIGINT) AS intra_edges,
           CAST(b.k AS BIGINT) AS n_communities,
           round(CAST(m.intra AS DOUBLE) / m.m
                 - CAST(b.b2 AS DOUBLE)
                   / (4.0 * m.m * m.m), 6) AS q_modularity
    FROM m, b
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-purchase graph under the part-brand
    partition: Q = intra/m − Σ_c d_c²/(4m²) from integer sufficient
    statistics only — intra-edge count, per-community degree sums, one
    fixed-order double expression at the end. Closed-form pins: two
    disjoint triangles split into their own communities give Q = 1/2;
    the all-one-community partition gives Q = 0.

    Scale: two dim joins to attach brands (S17 policy decides
    broadcast), one |E|-sized union for degrees, a |brands|-row
    community fold — linear in edges like every lane on this graph."""
    edges = _edges(spark, sf_dir)
    bru = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    tagged = (
        edges.join(
            bru.select(
                F.col("p_partkey").alias("u"), F.col("p_brand").alias("bu")
            ),
            "u",
        )
        .join(
            bru.select(
                F.col("p_partkey").alias("v"), F.col("p_brand").alias("bv")
            ),
            "v",
        )
    )
    m = tagged.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(F.col("bu") == F.col("bv"), 1).otherwise(0)
        ).alias("intra"),
    )
    degs = (
        tagged.select(F.col("u").alias("node"), F.col("bu").alias("brand"))
        .unionAll(
            tagged.select(F.col("v").alias("node"), F.col("bv").alias("brand"))
        )
        .groupBy("node", "brand")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    comm = degs.groupBy("brand").agg(F.sum("deg").alias("d_c"))
    b = comm.agg(
        F.sum(F.col("d_c") * F.col("d_c")).alias("b2"),
        F.count(F.lit(1)).alias("k"),
    )
    return m.crossJoin(F.broadcast(b)).select(
        bi(F.col("m")).alias("m_edges"),
        bi(F.col("intra")).alias("intra_edges"),
        bi(F.col("k")).alias("n_communities"),
        r6(
            F.col("intra").cast("double") / F.col("m")
            - F.col("b2").cast("double")
            / (4.0 * F.col("m") * F.col("m"))
        ).alias("q_modularity"),
    )
