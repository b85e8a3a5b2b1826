"""§2 round-2 addendum — graph analytics over the co-purchase graph.

A training-data pipeline sees graphs constantly (web link graphs for
quality weighting, citation graphs, dedup-cluster graphs); this lane
implements the three canonical distributed-graph primitives over the
derived part co-purchase graph (same edge definition as
orders_copurchase_pairs: a-priori-pruned parts, pairs supported by >= 2
orders — so the graph itself is reproducible from lineitem alone):

- graph_degree_distribution — degree histogram, the O(|E|) sanity pass.
- graph_triangle_count — exact triangle count via DEGREE-ORDERED edge
  orientation: every undirected edge is directed from the (degree, id)-
  smaller endpoint to the larger, making out-degrees O(sqrt(|E|))-bounded
  for any graph, so the wedge join (the quadratic step of naive triangle
  counting) does Σ outdeg² = O(|E|^1.5) work instead of Σ deg² — the
  standard MapReduce/GraphX-era result, expressed entirely in joins.
- graph_pagerank — 10 damped power iterations, the canonical iterative
  DataFrame loop: contributions = ranks ⋈ edges (one shuffle per
  iteration, keyed by dst), with localCheckpoint() every 4 iterations to
  truncate the growing lineage (the classic iterative-Spark failure mode
  at scale is plan blow-up, not data size). Rows-only lane: an iterative
  fixpoint has no ANSI-SQL twin.

At 100 TB the edge list is the big table: degree distribution and the
orientation step are single shuffles keyed by node; PageRank's per-
iteration shuffle is |E| contributions — all linear in edges, none
materialize neighborhoods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_EDGE_CTE = """
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pop AS (SELECT l_partkey FROM li GROUP BY l_partkey HAVING count(*) >= 3),
    f AS (SELECT l.l_orderkey, l.l_partkey FROM li l JOIN pop USING (l_partkey)),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM f a JOIN f b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges (u < v), the shared graph substrate."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    pop = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 3)
        .select("l_partkey")
    )
    f = li.join(pop, "l_partkey")
    a = f.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = f.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("u", "v")
    )


@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_EDGE_CTE},
    deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    )
    SELECT CAST(degree AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph: explode each undirected
    edge into both endpoints, one node-keyed count, one tiny histogram
    agg. Two linear shuffles; output is O(max_degree) rows regardless of
    graph size."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(bi(F.count(F.lit(1))).alias("n_nodes")).select(
        bi(F.col("degree")).alias("degree"), "n_nodes"
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGE_CTE},
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
    wedge AS (
      SELECT a.src, a.dst AS x, b.dst AS y
      FROM oe a JOIN oe b ON a.src = b.src
      WHERE (a.dst_deg, a.dst_id) < (b.dst_deg, b.dst_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes
    FROM wedge w
    WHERE EXISTS (SELECT 1 FROM oe t WHERE t.src = w.x AND t.dst = w.y)
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count with degree-ordered orientation: each
    undirected edge points from its (degree, id)-smaller endpoint to the
    larger, so every triangle is generated exactly once as a wedge at its
    smallest vertex, and wedge-join work is Σ outdeg² = O(|E|^1.5) on ANY
    graph (the orientation bounds out-degree even at power-law hubs). The
    closing-edge check is a semi join on the oriented edge list. Three
    shuffles total — degrees, wedges, closure — all equi-keyed."""
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
        F.col("src"),
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
    ).select("x", "y")
    closing = oe.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedge.join(closing, ["x", "y"], "left_semi")
    n_tri = tri.agg(bi(F.count(F.lit(1))).alias("n_triangles"))
    n_edges = e.agg(bi(F.count(F.lit(1))).alias("n_edges"))
    n_nodes = deg.agg(bi(F.count(F.lit(1))).alias("n_nodes"))
    return n_tri.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_nodes))


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_EDGE_CTE},
    ud AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v AS src, u AS dst FROM e),
    od AS (SELECT src, count(*) AS outdeg FROM ud GROUP BY src),
    ed AS MATERIALIZED (SELECT ud.src, ud.dst, od.outdeg FROM ud JOIN od USING (src)),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ud),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    r1 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r0.rank / ed.outdeg) AS csum FROM ed JOIN r0 ON r0.node = ed.src GROUP BY ed.dst) s USING (node)),
    r2 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r1.rank / ed.outdeg) AS csum FROM ed JOIN r1 ON r1.node = ed.src GROUP BY ed.dst) s USING (node)),
    r3 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r2.rank / ed.outdeg) AS csum FROM ed JOIN r2 ON r2.node = ed.src GROUP BY ed.dst) s USING (node)),
    r4 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r3.rank / ed.outdeg) AS csum FROM ed JOIN r3 ON r3.node = ed.src GROUP BY ed.dst) s USING (node)),
    r5 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r4.rank / ed.outdeg) AS csum FROM ed JOIN r4 ON r4.node = ed.src GROUP BY ed.dst) s USING (node)),
    r6 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r5.rank / ed.outdeg) AS csum FROM ed JOIN r5 ON r5.node = ed.src GROUP BY ed.dst) s USING (node)),
    r7 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r6.rank / ed.outdeg) AS csum FROM ed JOIN r6 ON r6.node = ed.src GROUP BY ed.dst) s USING (node)),
    r8 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r7.rank / ed.outdeg) AS csum FROM ed JOIN r7 ON r7.node = ed.src GROUP BY ed.dst) s USING (node)),
    r9 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r8.rank / ed.outdeg) AS csum FROM ed JOIN r8 ON r8.node = ed.src GROUP BY ed.dst) s USING (node)),
    r10 AS MATERIALIZED (SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.csum, 0) AS rank FROM nodes LEFT JOIN (SELECT ed.dst AS node, sum(r9.rank / ed.outdeg) AS csum FROM ed JOIN r9 ON r9.node = ed.src GROUP BY ed.dst) s USING (node))
    SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r10
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 10 iterations) on the undirected
    co-purchase graph, the canonical iterative DataFrame loop. Each
    iteration is ONE shuffle: contributions = ranks ⋈ directed-edges
    (rank/out_degree per neighbor), grouped by destination. Lineage is
    truncated with localCheckpoint() every 4 iterations — without it the
    logical plan doubles per iteration and plan compilation, not data,
    becomes the scale bottleneck. The undirected graph has no dangling
    nodes (every node has >= 1 edge), so no dangling-mass term is needed.
    Round 6: fully VALUE-ORACLED — the oracle unrolls the identical 10
    damped iterations as MATERIALIZED CTEs (the events_markov_stationary
    pattern), so both engines sit on the same trajectory and the r6 hash
    certifies rank values, not just row counts."""
    e = _edges(spark, sf_dir)
    # undirected -> both directions; out_degree per src
    edges = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = edges.join(outdeg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    d = 0.85
    for i in range(10):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            ((1 - d) / n_nodes + d * F.coalesce(F.col("csum"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if i % 4 == 3:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", r6(F.col("rank") * n_nodes).alias("rank_scaled"))


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH {_EDGE_CTE},
    sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    deg AS (SELECT u AS node, count(*) AS d FROM sym GROUP BY 1),
    common AS (
      SELECT a.u AS u, b.u AS v, count(*) AS n_common
      FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    )
    SELECT e.u, e.v,
      CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
      round(COALESCE(c.n_common, 0) / (du.d + dv.d - COALESCE(c.n_common, 0)), 6) AS jaccard
    FROM e
    LEFT JOIN common c ON c.u = e.u AND c.v = e.v
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural edge similarity: for every co-purchase edge (u, v), the
    common-neighbor count and neighborhood Jaccard |N(u)∩N(v)| /
    |N(u)∪N(v)| — the link-prediction / graph-dedup primitive (edges with
    high neighborhood overlap are redundant or community-internal).
    Common neighbors come from ONE wedge self-join on the symmetrized
    edge list keyed by the shared endpoint — the same O(Σ deg²) bound the
    triangle count manages, here without orientation because the (u < v)
    output grain already halves the wedge space. Degrees are a
    node-keyed dimension joined in; all shuffles are edge/node-keyed —
    nothing materializes a neighborhood list."""
    e = _edges(spark, sf_dir)
    sym = e.select("u", "v").unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    a = sym.select(F.col("u").alias("cu"), F.col("v").alias("w"))
    b = sym.select(F.col("u").alias("cv"), F.col("v").alias("w2"))
    common = (
        a.join(b, (F.col("w") == F.col("w2")) & (F.col("cu") < F.col("cv")))
        .groupBy(F.col("cu").alias("u"), F.col("cv").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    return (
        e.join(common, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            bi(nc).alias("n_common"),
            r6(nc / (F.col("du") + F.col("dv") - nc)).alias("jaccard"),
        )
    )


@query(
    "graph_k_core",
    oracle=f"""
    WITH {_EDGE_CTE},
    e0 AS MATERIALIZED (SELECT u, v FROM e),
    deg1 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
      GROUP BY node
    ),
    surv1 AS (SELECT node FROM deg1 WHERE d >= 2),
    e1 AS MATERIALIZED (
      SELECT x.u, x.v FROM e0 x
      JOIN surv1 a ON a.node = x.u
      JOIN surv1 b ON b.node = x.v
    ),
    deg2 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e1 UNION ALL SELECT v AS node FROM e1)
      GROUP BY node
    ),
    surv2 AS (SELECT node FROM deg2 WHERE d >= 2),
    e2 AS MATERIALIZED (
      SELECT x.u, x.v FROM e1 x
      JOIN surv2 a ON a.node = x.u
      JOIN surv2 b ON b.node = x.v
    ),
    deg3 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e2 UNION ALL SELECT v AS node FROM e2)
      GROUP BY node
    ),
    surv3 AS (SELECT node FROM deg3 WHERE d >= 2),
    e3 AS MATERIALIZED (
      SELECT x.u, x.v FROM e2 x
      JOIN surv3 a ON a.node = x.u
      JOIN surv3 b ON b.node = x.v
    ),
    deg4 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3)
      GROUP BY node
    ),
    surv4 AS (SELECT node FROM deg4 WHERE d >= 2),
    e4 AS MATERIALIZED (
      SELECT x.u, x.v FROM e3 x
      JOIN surv4 a ON a.node = x.u
      JOIN surv4 b ON b.node = x.v
    ),
    deg5 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e4 UNION ALL SELECT v AS node FROM e4)
      GROUP BY node
    ),
    surv5 AS (SELECT node FROM deg5 WHERE d >= 2),
    e5 AS MATERIALIZED (
      SELECT x.u, x.v FROM e4 x
      JOIN surv5 a ON a.node = x.u
      JOIN surv5 b ON b.node = x.v
    ),
    deg6 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e5 UNION ALL SELECT v AS node FROM e5)
      GROUP BY node
    ),
    surv6 AS (SELECT node FROM deg6 WHERE d >= 2),
    e6 AS MATERIALIZED (
      SELECT x.u, x.v FROM e5 x
      JOIN surv6 a ON a.node = x.u
      JOIN surv6 b ON b.node = x.v
    ),
    deg7 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e6 UNION ALL SELECT v AS node FROM e6)
      GROUP BY node
    ),
    surv7 AS (SELECT node FROM deg7 WHERE d >= 2),
    e7 AS MATERIALIZED (
      SELECT x.u, x.v FROM e6 x
      JOIN surv7 a ON a.node = x.u
      JOIN surv7 b ON b.node = x.v
    ),
    deg8 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e7 UNION ALL SELECT v AS node FROM e7)
      GROUP BY node
    ),
    surv8 AS (SELECT node FROM deg8 WHERE d >= 2),
    e8 AS MATERIALIZED (
      SELECT x.u, x.v FROM e7 x
      JOIN surv8 a ON a.node = x.u
      JOIN surv8 b ON b.node = x.v
    ),
    deg9 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e8 UNION ALL SELECT v AS node FROM e8)
      GROUP BY node
    ),
    surv9 AS (SELECT node FROM deg9 WHERE d >= 2),
    e9 AS MATERIALIZED (
      SELECT x.u, x.v FROM e8 x
      JOIN surv9 a ON a.node = x.u
      JOIN surv9 b ON b.node = x.v
    ),
    deg10 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e9 UNION ALL SELECT v AS node FROM e9)
      GROUP BY node
    ),
    surv10 AS (SELECT node FROM deg10 WHERE d >= 2),
    e10 AS MATERIALIZED (
      SELECT x.u, x.v FROM e9 x
      JOIN surv10 a ON a.node = x.u
      JOIN surv10 b ON b.node = x.v
    ),
    deg11 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e10 UNION ALL SELECT v AS node FROM e10)
      GROUP BY node
    ),
    surv11 AS (SELECT node FROM deg11 WHERE d >= 2),
    e11 AS MATERIALIZED (
      SELECT x.u, x.v FROM e10 x
      JOIN surv11 a ON a.node = x.u
      JOIN surv11 b ON b.node = x.v
    ),
    deg12 AS (
      SELECT node, count(*) AS d
      FROM (SELECT u AS node FROM e11 UNION ALL SELECT v AS node FROM e11)
      GROUP BY node
    ),
    surv12 AS (SELECT node FROM deg12 WHERE d >= 2),
    e12 AS MATERIALIZED (
      SELECT x.u, x.v FROM e11 x
      JOIN surv12 a ON a.node = x.u
      JOIN surv12 b ON b.node = x.v
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT u AS node FROM e12 UNION ALL SELECT v AS node FROM e12)
    -- convergence self-check: if 12 unrolled peels did NOT reach the
    -- fixpoint the oracle emits ZERO rows (loud rows-mismatch), never a
    -- silently-unconverged core
    WHERE (SELECT count(*) FROM e12) = (SELECT count(*) FROM e11)
    GROUP BY node
    """,
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core decomposition of the co-purchase graph: iteratively peel
    nodes of degree < 2 until the remaining subgraph has minimum degree
    ≥ 2 (every tree/tendril appendage cascades away, only cyclic
    structure survives — k chosen so the core is non-trivial at every
    fixture scale; the loop is k-generic) — the density filter community detection and spam-graph
    pruning both start from (a k-core survives only on mutually
    well-connected nodes; degree alone does not). Each round is one
    degree agg + one semi-join edge filter — both edge-keyed shuffles,
    no neighborhood materialization; lineage is truncated with
    localCheckpoint() every round since surviving-edge plans nest.
    Termination is a 1-scalar count check per round (same driver-side
    convergence pattern as dedup_cluster_cc); the k-core is unique, so
    the fixpoint is deterministic regardless of peel order. Output:
    surviving nodes with their within-core degrees. Rows-only lane:
    iterative deletion has no ANSI-SQL twin; values pinned in
    tests/test_iterative_pins.py on a planted core-plus-tendrils
    fixture."""
    k = 2
    # the peeled graph shrinks monotonically: 4 partitions keep per-round
    # task overhead proportional to the (small) surviving graph, and the
    # convergence check IS the post-peel edge count — one action per
    # round, not a separate emptiness probe
    edges = _edges(spark, sf_dir).select("u", "v").coalesce(4).localCheckpoint()
    n_prev = edges.count()
    while True:
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        survivors = deg.where(F.col("d") >= k).select("node")
        edges = (
            edges.join(survivors.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(survivors.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n = edges.count()
        if n == n_prev:
            break
        n_prev = n
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(bi(F.count(F.lit(1))).alias("core_degree"))
    )


@query(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE {_EDGE_CTE},
    sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    seeds AS (
      SELECT node FROM (
        SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e
      ) ORDER BY node LIMIT 5
    ),
    walk(node, d) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT s.v, w.d + 1 FROM walk w JOIN sym s ON s.u = w.node WHERE w.d < 4
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(d) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS to hop-limit 4 over the co-purchase graph — the
    distance primitive behind influence radii, crawl-frontier depth, and
    "how far is this node from any trusted seed" quality weighting.
    Seeds are the 5 smallest node ids (deterministic). Frontier
    iteration with first-visit pruning: each round joins ONLY the
    current frontier (not all visited nodes) against the symmetric edge
    list, anti-joins the visited set so a node's first visit IS its
    minimum distance (BFS invariant — no min-agg over all walks needed),
    and localCheckpoints the shrinking frontier. Per round the shuffle
    is |frontier ⋈ edges| — never the full walk enumeration the naive
    UNION-ALL recursive form materializes (that is exactly why the
    DuckDB oracle uses recursive-UNION-distinct: all WALKS of length ≤4
    in a dense graph are combinatorial; (node, d) STATES are bounded by
    5·|V|). Hop-bounded on purpose: unbounded BFS is graph-diameter
    rounds (fine too — dedup_cluster_cc does it); the bounded form is
    what a 100 TB crawl-depth or trust-radius job actually runs, and it
    is the form ANSI SQL can oracle exactly."""
    e = _edges(spark, sf_dir)
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    ).distinct()
    seeds = nodes.orderBy("node").limit(5)
    dist = seeds.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, 5):
        reached = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
        )
        fresh = reached.join(dist, "node", "left_anti").withColumn(
            "dist", F.lit(h)
        ).localCheckpoint(eager=True)
        if fresh.isEmpty():
            break
        dist = dist.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh.select("node")
    return dist.select(bi(F.col("node")).alias("node"), bi(F.col("dist")).alias("dist"))
