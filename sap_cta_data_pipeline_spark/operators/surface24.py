"""§2 round-8 batch EC — HITS hubs/authorities, seasonal-strength
measures, and Luhn checksum validation.

- ``graph_hits_bipartite``: Kleinberg's HITS on the customer→part
  purchase graph (the bipartite setting HITS was designed for): 6
  synchronized power iterations of a = normalize(Aᵀh),
  h = normalize(A a); value-oracled by unrolling the IDENTICAL
  iterations as MATERIALIZED CTEs (the graph_pagerank discipline), so
  the hash certifies scores, not row counts.
- ``ts_seasonal_strength``: Hyndman's STL-based strength-of-component
  measures — F_seasonal = max(0, 1 − Var(R)/Var(S+R)), F_trend =
  max(0, 1 − Var(R)/Var(T+R)) — computed over the SAME decomposition
  ts_stl_decompose_daily emits (its oracle is reused verbatim as a
  subquery, so both engines measure the same components).
- ``fn_luhn_check``: the Luhn mod-10 checksum (payment-card validation,
  the dq staple) as pure unrolled integer arithmetic: half the fixture
  numbers carry the CORRECT check digit, half an off-by-one — both the
  check-digit construction and the validation run identically in both
  engines; the classic vector 79927398713 is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import ORACLES, query
from . import timeseries2  # noqa: F401  (registers the STL oracle we embed)

_HITS_ITERS = 6


def _hits_oracle() -> str:
    ctes = [
        "eg AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p"
        " FROM orders JOIN lineitem ON l_orderkey = o_orderkey)",
        "h0 AS MATERIALIZED (SELECT DISTINCT c, 1.0 AS h FROM eg)",
    ]
    prev_h = "h0"
    for k in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT p, sum(h) AS a FROM eg"
            f" JOIN {prev_h} USING (c) GROUP BY p)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT p,"
            f" a / sqrt((SELECT sum(a * a) FROM ar{k})) AS a FROM ar{k})"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT c, sum(a) AS h FROM eg"
            f" JOIN a{k} USING (p) GROUP BY c)"
        )
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT c,"
            f" h / sqrt((SELECT sum(h * h) FROM hr{k})) AS h FROM hr{k})"
        )
        prev_h = f"h{k}"
    k = _HITS_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT 'authority' AS role, CAST(p AS BIGINT) AS node,
           round(a, 6) AS score FROM a{k}
    UNION ALL
    SELECT 'hub' AS role, CAST(c AS BIGINT) AS node,
           round(h, 6) AS score FROM h{k}
    """
    )


@query("graph_hits_bipartite", oracle=_hits_oracle())
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the bipartite customer→part purchase graph: authority
    (part) = Σ hub scores of its buyers, hub (customer) = Σ authority
    scores of what they buy, each L2-normalized, 6 synchronized
    iterations from h₀ = 1. High-authority parts are bought by broad
    buyers; high-hub customers buy broadly-bought parts — the mutual
    reinforcement PageRank's single score can't express. The oracle
    unrolls the identical trajectory (MATERIALIZED CTEs + scalar norm
    subqueries), value-certifying the scores.

    Scale: each iteration is two keyed shuffles (edges ⋈ scores,
    grouped by the other side) and NOTHING else — normalization is
    DEFERRED out of the loop entirely. Each per-iteration L2 normalize
    only rescales, and the maps h↦Aᵀh, a↦Aa are linear, so the
    unnormalized trajectory stays proportional to the normalized one:
    the direction after 6 iterations is identical, and 6 iterations of
    raw degree-weighted sums cannot overflow doubles (growth ≈ ‖A‖² per
    iteration). The two FINAL norms attach as §R class-2 1-row scalar
    crossJoins (2 one-row broadcasts per run, vs the round-8 shape's 12
    in-loop `Exchange SinglePartition` passes over corpus-sized node
    frames — the round-8 verdict's scale defect). The edge build is
    hinted shuffle_hash (fact⋈fact); lineage is checkpoint-truncated
    mid-loop."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # fact⋈fact: force the shuffle hash join — broadcasting the orders
    # side is wrong at scale AND exhausts long-session driver memory
    # (the 571-key shared-session sweep surfaced exactly that)
    eg = (
        o.select("o_orderkey", "o_custkey")
        .hint("shuffle_hash")
        .join(li.select("l_orderkey", "l_partkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    h = eg.select("c").distinct().withColumn("h", F.lit(1.0))
    a = None
    # Unnormalized power iteration: in-loop L2 norms only rescale (see
    # docstring), so the loop body is purely the two keyed shuffles.
    # The score frames are NODE-cardinality (they grow with the corpus),
    # so the joins are hinted shuffle_hash — never broadcast-planned:
    # at 100× a broadcast of one side is the wrong plan, and in a long
    # shared session (the 600-key sweep) each iteration's broadcast
    # build lands on a heap full of stale broadcast blocks and fails
    # ("Not enough memory to build and broadcast" — observed at sf0.1
    # in both round 8 and round 9 before this hint). The loop is now
    # broadcast-FREE; the only broadcasts are the two 1-row post-loop
    # norm scalars.
    for k in range(1, _HITS_ITERS + 1):
        a = eg.join(h.hint("shuffle_hash"), "c").groupBy("p").agg(
            F.sum("h").alias("a")
        )
        h = eg.join(a.hint("shuffle_hash"), "p").groupBy("c").agg(
            F.sum("a").alias("h")
        )
        if k == 3:
            a, h = a.localCheckpoint(), h.localCheckpoint()
    # Final normalization: 1-row aggregates attached via explicit-
    # broadcast crossJoin (§R class 2) — two 1-row broadcast blocks per
    # run, which long-session hygiene tolerates (the round-8 concern was
    # 12 per run accumulating across a 571-key sweep).
    a_n = a.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("__n"))
    h_n = h.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("__n"))
    a = a.crossJoin(F.broadcast(a_n)).select(
        "p", (F.col("a") / F.col("__n")).alias("a")
    )
    h = h.crossJoin(F.broadcast(h_n)).select(
        "c", (F.col("h") / F.col("__n")).alias("h")
    )
    return a.select(
        F.lit("authority").alias("role"),
        bi(F.col("p")).alias("node"),
        r6(F.col("a")).alias("score"),
    ).unionAll(
        h.select(
            F.lit("hub").alias("role"),
            bi(F.col("c")).alias("node"),
            r6(F.col("h")).alias("score"),
        )
    )


@query(
    "ts_seasonal_strength",
    oracle=f"""
    WITH stl AS ({ORACLES["ts_stl_decompose_daily"]})
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(greatest(0, 1 - var_samp(residual)
                 / var_samp(seasonal + residual)), 6) AS f_seasonal,
           round(greatest(0, 1 - var_samp(residual)
                 / var_samp(trend + residual)), 6) AS f_trend
    FROM stl WHERE trend IS NOT NULL
    """,
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's strength-of-component measures over the daily STL
    decomposition: F_seasonal = max(0, 1 − Var(R)/Var(S+R)) (≈1 when
    the seasonal component explains the detrended series, ≈0 when the
    'seasonality' is noise) and the analogous F_trend — the two numbers
    a forecasting platform uses to ROUTE series (seasonal models vs
    smoothers) before fitting anything. Components come from the same
    decomposition ts_stl_decompose_daily certifies (its oracle is
    embedded verbatim), so the measures are engine-identical to 6 dp.

    Scale: the decomposition's day-grain windows dominate (documented
    there, §R class 3); the strengths are one aggregation over days."""
    from .timeseries2 import ts_stl_decompose_daily

    stl = ts_stl_decompose_daily.__wrapped__(spark, sf_dir).filter(
        F.col("trend").isNotNull()
    )
    vr = F.var_samp("residual")
    return stl.agg(
        bi(F.count(F.lit(1))).alias("n_days"),
        r6(
            F.greatest(
                F.lit(0.0),
                1 - vr / F.var_samp(F.col("seasonal") + F.col("residual")),
            )
        ).alias("f_seasonal"),
        r6(
            F.greatest(
                F.lit(0.0),
                1 - vr / F.var_samp(F.col("trend") + F.col("residual")),
            )
        ).alias("f_trend"),
    )


def _luhn_sum_sql(n: str, digits: int) -> str:
    """Luhn weighted digit sum of ``n`` (rightmost digit position 0),
    doubling odd positions (from the right) and folding >9 via −9."""
    terms = []
    for k in range(digits):
        d = f"(({n}) // {10 ** k} % 10)"
        if k % 2 == 1:
            terms.append(f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)")
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ")"


def _luhn_sum_col(n, digits: int):
    acc = F.lit(0)
    for k in range(digits):
        d = F.expr(f"({n}) div {10 ** k}") % 10
        if k % 2 == 1:
            acc = acc + F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        else:
            acc = acc + d
    return acc


@query(
    "fn_luhn_check",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             o_orderkey * 10
             + CASE WHEN o_orderkey % 2 = 0
                    THEN (10 - {_luhn_sum_sql("o_orderkey * 10", 12)} % 10) % 10
                    ELSE ((10 - {_luhn_sum_sql("o_orderkey * 10", 12)} % 10) % 10
                          + 1) % 10
               END AS card_number
      FROM orders WHERE o_orderkey % 59 = 0
    )
    SELECT o_orderkey,
           CAST(card_number AS BIGINT) AS card_number,
           {_luhn_sum_sql("card_number", 12)} % 10 = 0 AS luhn_valid
    FROM base
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 validation — the payment-card/IMEI checksum every
    ingest-side dq suite carries: synthetic card numbers are built from
    order keys with the CORRECT check digit for even keys and an
    off-by-one digit for odd keys, then validated by the same unrolled
    weighted digit sum (double every second digit from the right, fold
    >9 by −9, valid iff total ≡ 0 mod 10). Pure integer arithmetic over
    12 fixed positions — engine-identical; the classic valid vector
    79927398713 is pinned in tests.

    Scale: map-side arithmetic, zero shuffle — the validation cost is
    one codegen'd expression per row at any volume."""
    o = t(spark, sf_dir, "orders").filter("o_orderkey % 59 = 0")
    shifted = "o_orderkey * 10"
    check = (10 - _luhn_sum_col(shifted, 12) % 10) % 10
    card = (
        F.col("o_orderkey") * 10
        + F.when(F.col("o_orderkey") % 2 == 0, check).otherwise(
            (check + 1) % 10
        )
    ).alias("card_number")
    base = o.select("o_orderkey", card)
    return base.select(
        "o_orderkey",
        bi(F.col("card_number")).alias("card_number"),
        (_luhn_sum_col("card_number", 12) % 10 == 0).alias("luhn_valid"),
    )
