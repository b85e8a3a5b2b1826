"""§2 round-7 batch CK — graph structure statistics.

Extends the co-purchase graph lane (graph_ops.py: degrees, exact
triangles via degree-ordered orientation, PageRank, k-core, BFS, common
neighbors, label propagation) with the two structure statistics a graph
analyst reads FIRST when profiling a new graph:

- local clustering coefficient, reported as the C(k) curve (average
  clustering per degree) — the standard small-world / hub-behavior
  diagnostic; per-node coefficients come from per-node triangle counts
  obtained by EXPLODING each oriented triangle to its three corners
  (every triangle counted once per corner, no double counting by
  construction of the orientation),
- degree assortativity (Newman's r): Pearson correlation of endpoint
  degrees over the DIRECTED edge multiset (each undirected edge counted
  in both directions, the standard symmetrization) — do hubs attach to
  hubs (r>0) or to leaves (r<0)?

Scale notes: both reuse the oriented-wedge machinery whose work bound is
Σ outdeg² = O(|E|^1.5) regardless of hub skew; everything downstream of
triangle enumeration is keyed aggregation on node- or degree-grain rows.
No per-node state ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import bi, r6
from ..registry import query
from .graph_ops import _EDGE_CTE, _edges

_ORIENTED_TRIANGLES_CTE = f"""
    {_EDGE_CTE},
    deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ),
    oe AS (
      SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS dst,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN dv.degree ELSE du.degree END AS dst_deg,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS dst_id
      FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT a.src AS n1, a.dst AS n2, b.dst AS n3
      FROM oe a JOIN oe b ON a.src = b.src
      WHERE (a.dst_deg, a.dst_id) < (b.dst_deg, b.dst_id)
        AND EXISTS (SELECT 1 FROM oe t WHERE t.src = a.dst AND t.dst = b.dst)
    )
"""


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_ORIENTED_TRIANGLES_CTE},
    corner AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT n1 AS node FROM tri
        UNION ALL SELECT n2 AS node FROM tri
        UNION ALL SELECT n3 AS node FROM tri
      ) GROUP BY node
    ),
    local AS (
      SELECT d.degree,
             CASE WHEN d.degree >= 2
                  THEN coalesce(c.n_tri, 0) * 2.0 / (d.degree * (d.degree - 1))
                  ELSE 0.0 END AS cc
      FROM deg d LEFT JOIN corner c ON d.node = c.node
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(avg(cc), 6) AS avg_clustering
    FROM local GROUP BY 1
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C(k) curve: average local clustering coefficient per degree.
    Per-node triangle counts come from exploding each oriented triangle
    to its three corners (the orientation already guarantees each
    triangle is enumerated exactly once, so corner counts need no
    dedup); local cc = 2·tri / (deg·(deg−1)), zero for degree-1 nodes.
    Downstream of the O(|E|^1.5) wedge join everything is node- then
    degree-grain aggregation — the curve is how analysts read 'is this
    graph clustered like a social network or flat like a random one'."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    ).withColumn("dst_id", F.col("dst"))
    a = oe.select(
        "src",
        F.col("dst").alias("x"),
        F.col("dst_deg").alias("xd"),
        F.col("dst_id").alias("xi"),
    )
    b = oe.select(
        F.col("src").alias("src2"),
        F.col("dst").alias("y"),
        F.col("dst_deg").alias("yd"),
        F.col("dst_id").alias("yi"),
    )
    wedge = a.join(
        b,
        (F.col("src") == F.col("src2"))
        & (
            (F.col("xd") < F.col("yd"))
            | ((F.col("xd") == F.col("yd")) & (F.col("xi") < F.col("yi")))
        ),
    ).select("src", "x", "y")
    closing = oe.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedge.join(closing, ["x", "y"], "left_semi")
    corners = (
        tri.select(F.explode(F.array("src", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    local = deg.join(corners, "node", "left").select(
        "degree",
        F.when(
            F.col("degree") >= 2,
            F.coalesce(F.col("n_tri"), F.lit(0))
            * 2.0
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(0.0)
        .alias("cc"),
    )
    return local.groupBy(bi(F.col("degree")).alias("degree")).agg(
        bi(F.count(F.lit(1))).alias("n_nodes"),
        r6(F.avg("cc")).alias("avg_clustering"),
    )


@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_EDGE_CTE},
    deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ),
    de AS (
      SELECT du.degree AS dsrc, dv.degree AS ddst
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.degree, du.degree
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
           round(corr(dsrc, ddst), 6) AS assortativity
    FROM de
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman's degree assortativity: Pearson correlation of endpoint
    degrees over the symmetrized edge list (each undirected edge counted
    both directions — the one-direction shortcut biases r on any graph
    where edge orientation correlates with degree, which the u<v
    convention guarantees here). r>0 = hubs prefer hubs (social), r<0 =
    hubs fan out to leaves (technological/co-purchase). One degree join
    + one corr aggregate — edge-linear."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    de = ed.select(
        F.col("du").alias("dsrc"), F.col("dv").alias("ddst")
    ).unionAll(ed.select(F.col("dv").alias("dsrc"), F.col("du").alias("ddst")))
    return de.agg(
        bi(F.count(F.lit(1)) / 2).alias("n_edges"),
        r6(F.corr("dsrc", "ddst")).alias("assortativity"),
    )
