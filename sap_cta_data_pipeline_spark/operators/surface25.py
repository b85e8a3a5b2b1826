"""§2 round-8 batch EE — Kneser-Ney smoothing + newsvendor stocking.

- ``text_lm_kneser_ney_bigram``: the smoothing that made n-gram LMs
  work (Kneser & Ney 1995, absolute discounting with continuation
  probabilities): P(w₂|w₁) = max(c(w₁w₂)−d, 0)/c(w₁·) +
  d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··). The continuation term is the
  insight — "Francisco" is frequent but only ever follows "San", so its
  continuation probability is tiny. Extends the add-k lane
  (text_lm_bigram_score) with the estimator production n-gram models
  actually shipped.
- ``part_newsvendor_stock``: the newsvendor quantile rule — optimal
  stock q* = the cu/(cu+co) quantile of daily demand (critical ratio
  0.9 here) — per part brand, with the expected leftover/shortage the
  choice implies. The canonical one-period inventory decision, computed
  exactly from the demand distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_KN_D = 0.75
_MIN_C12 = 3


@query(
    "text_lm_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_zip(list_slice(tk, 1, len(tk) - 1),
                             list_slice(tk, 2, len(tk)))) AS g
      FROM toks WHERE len(tk) >= 2
    ),
    c12 AS (
      SELECT g[1] AS w1, g[2] AS w2, count(*) * 1.0 AS c FROM bg GROUP BY 1, 2
    ),
    c1 AS (
      SELECT w1, sum(c) AS c1, count(*) * 1.0 AS n1p_fwd FROM c12 GROUP BY w1
    ),
    cont AS (
      SELECT w2, count(*) * 1.0 AS n1p_back FROM c12 GROUP BY w2
    ),
    total AS (SELECT count(*) * 1.0 AS n_types FROM c12)
    SELECT c12.w1, c12.w2,
           CAST(c12.c AS BIGINT) AS c12,
           round(greatest(c12.c - {_KN_D}, 0) / c1.c1
                 + {_KN_D} * c1.n1p_fwd / c1.c1
                   * cont.n1p_back / total.n_types, 6) AS p_kn
    FROM c12
    JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN total
    WHERE c12.c >= {_MIN_C12}
    """,
)
def text_lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities over the document
    corpus (discount d = 0.75, the standard value): the discounted ML
    term max(c−d,0)/c(w₁·) plus the backoff mass d·N₁₊(w₁·)/c(w₁·)
    weighted by the CONTINUATION probability N₁₊(·w₂)/N₁₊(··) — how
    many distinct contexts w₂ completes, not how often it occurs.
    Output restricted to bigrams seen ≥ 3 times (bounded result, full
    counts still inform the estimate). The row-sum-to-1 property over a
    fixed context (up to the ≥3 cut) and a planted Francisco-style pin
    certify the estimator in tests.

    Scale: three aggregations over the bigram frame (c₁₂, the w1 and
    w2 marginals) + one 1-row type count — all gram-keyed shuffles of
    the dedup-lane grain; no pairwise stage. This is how KN tables for
    production n-gram models were always built — counting, not
    training."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("tk")
    ).filter(F.size("tk") >= 2)
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.size("tk") - 1),
                F.slice("tk", 2, F.size("tk") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g")
    ).select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg((F.count(F.lit(1)) * 1.0).alias("c"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("c1"), (F.count(F.lit(1)) * 1.0).alias("n1p_fwd")
    )
    cont = c12.groupBy("w2").agg((F.count(F.lit(1)) * 1.0).alias("n1p_back"))
    total = c12.agg((F.count(F.lit(1)) * 1.0).alias("n_types"))
    d = F.lit(_KN_D)
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total))
        .filter(F.col("c") >= _MIN_C12)
        .select(
            "w1",
            "w2",
            bi(F.col("c")).alias("c12"),
            r6(
                F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("c1")
                + d
                * F.col("n1p_fwd")
                / F.col("c1")
                * F.col("n1p_back")
                / F.col("n_types")
            ).alias("p_kn"),
        )
    )


_CU, _CO = 9.0, 1.0  # underage/overage cost -> critical ratio 0.9


@query(
    "part_newsvendor_stock",
    oracle=f"""
    WITH demand AS (
      SELECT p.p_brand AS brand, l.l_shipdate AS day,
             sum(l.l_quantity) AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    q AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n_days,
             percentile_disc({_CU / (_CU + _CO)}) WITHIN GROUP (ORDER BY d)
                 AS q_star,
             avg(d) AS mean_d
      FROM demand GROUP BY brand
    )
    SELECT q.brand, q.n_days,
           round(q.q_star, 6) AS q_star,
           round(q.mean_d, 6) AS mean_demand,
           round(avg(greatest(q.q_star - demand.d, 0)), 6)
               AS exp_leftover,
           round(avg(greatest(demand.d - q.q_star, 0)), 6)
               AS exp_shortage
    FROM q JOIN demand USING (brand)
    GROUP BY q.brand, q.n_days, q.q_star, q.mean_d
    """,
)
def part_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking per part brand: with underage cost 9 and
    overage cost 1 the optimal one-period stock is the 0.9-quantile
    (critical ratio cu/(cu+co)) of observed daily demand —
    percentile_disc so both engines pick the same ORDER STATISTIC (no
    interpolation ambiguity) — reported with the expected leftover and
    shortage that choice implies (the two costs the ratio balances).
    The optimality property (q* beats q*±1 order statistic on expected
    cost) is pinned in tests.

    Scale: one (brand, day) aggregation over the fact table, then
    brand-grain quantiles and a brand-keyed join back — demand history
    compresses to days×brands rows before anything expensive runs."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    demand = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("day"))
        .agg(F.sum("l_quantity").alias("d"))
    )
    q = demand.groupBy("brand").agg(
        bi(F.count(F.lit(1))).alias("n_days"),
        F.expr(f"percentile_disc({_CU / (_CU + _CO)}) WITHIN GROUP (ORDER BY d)").alias("q_star"),
        F.avg("d").alias("mean_d"),
    )
    return (
        demand.join(q, "brand")
        .groupBy("brand", "n_days", "q_star", "mean_d")
        .agg(
            r6(F.avg(F.greatest(F.col("q_star") - F.col("d"), F.lit(0.0)))).alias(
                "exp_leftover"
            ),
            r6(F.avg(F.greatest(F.col("d") - F.col("q_star"), F.lit(0.0)))).alias(
                "exp_shortage"
            ),
        )
        .select(
            "brand",
            "n_days",
            r6(F.col("q_star")).alias("q_star"),
            r6(F.col("mean_d")).alias("mean_demand"),
            "exp_leftover",
            "exp_shortage",
        )
    )
