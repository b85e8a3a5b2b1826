"""§2 round-6 batch BU — ranking-quality evaluation (NDCG@k, MAP@k, MRR).

The offline retrieval metrics every search / recommender / RAG pipeline
reports. Framing: each nation is a "query", its customers are ranked by
a deterministic model score (c_acctbal DESC, c_custkey tiebreak), and
relevance is binary (c_mktsegment = 'BUILDING') — so all three metrics
are FULLY value-oracled, unlike typical eval code that hides behind
library calls.

Shapes: one keyed window (rank within query) + one keyed agg per metric —
no per-query loops, no collect. The ideal ranking for IDCG is a SECOND
window (relevance-first order), not a sequence literal, so both engines
compute it identically. At 100 TB (billions of scored candidates), the
two windows shuffle once on query key; queries are independent, so skew
is bounded by the largest candidate set — the same grain as win_topn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import r6
from ..registry import query

_K = 10

_RANKED_SQL = """
    ranked AS (
      SELECT
        c_nationkey AS query_id,
        CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS rel,
        row_number() OVER (
          PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
        ) AS rn
      FROM customer
    )
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        F.col("c_nationkey").alias("query_id"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("rel"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "ml_ndcg_at_k",
    oracle=f"""
    WITH {_RANKED_SQL},
    ideal AS (
      SELECT query_id, rel,
             row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, rn) AS irn
      FROM ranked
    ),
    dcg AS (
      SELECT query_id,
             sum(CASE WHEN rn <= {_K} THEN rel / log2(rn + 1) ELSE 0 END) AS dcg,
             sum(rel) AS n_rel
      FROM ranked GROUP BY query_id
    ),
    idcg AS (
      SELECT query_id,
             sum(CASE WHEN irn <= {_K} THEN rel / log2(irn + 1) ELSE 0 END) AS idcg
      FROM ideal GROUP BY query_id
    )
    SELECT dcg.query_id AS query_id,
           CAST(dcg.n_rel AS BIGINT) AS n_rel,
           round(CASE WHEN idcg.idcg > 0 THEN dcg.dcg / idcg.idcg ELSE 0 END, 6)
             AS ndcg_at_10
    FROM dcg JOIN idcg ON dcg.query_id = idcg.query_id
    """,
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query: DCG over the model ranking, IDCG over the
    relevance-ideal ranking of the SAME items (second window — no
    closed-form sequence, so ties and truncation behave identically in
    both engines), ratio guarded for zero-relevant queries."""
    ranked = _ranked(spark, sf_dir)
    wi = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("rn"))
    ideal = ranked.withColumn("irn", F.row_number().over(wi))
    per_q = ideal.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(
            F.when(F.col("rn") <= _K, F.col("rel") / F.log2(F.col("rn") + 1)).otherwise(
                0.0
            )
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("irn") <= _K, F.col("rel") / F.log2(F.col("irn") + 1)
            ).otherwise(0.0)
        ).alias("idcg"),
    )
    return per_q.select(
        "query_id",
        "n_rel",
        r6(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0)
        ).alias("ndcg_at_10"),
    )


@query(
    "ml_map_at_k",
    oracle=f"""
    WITH {_RANKED_SQL},
    hits AS (
      SELECT query_id, rel, rn,
             sum(rel) OVER (
               PARTITION BY query_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_rel
      FROM ranked
    )
    SELECT query_id,
           round(CASE WHEN least(sum(rel), {_K}) > 0
                 THEN sum(CASE WHEN rel = 1 AND rn <= {_K}
                               THEN CAST(cum_rel AS DOUBLE) / rn ELSE 0 END)
                      / least(sum(rel), {_K})
                 ELSE 0 END, 6) AS ap_at_10,
           round(sum(CASE WHEN rn <= {_K} THEN rel ELSE 0 END) / CAST({_K} AS DOUBLE), 6)
             AS p_at_10,
           round(CASE WHEN sum(rel) > 0
                 THEN sum(CASE WHEN rn <= {_K} THEN rel ELSE 0 END)
                      / CAST(sum(rel) AS DOUBLE)
                 ELSE 0 END, 6) AS recall_at_10
    FROM hits GROUP BY query_id
    """,
)
def ml_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP@10 (precision-at-hit averaged over min(R, k)), plus P@10 and
    recall@10, per query. The running relevant-count is one cumulative
    window over the ranking — no self-join, no per-rank loop."""
    ranked = _ranked(spark, sf_dir)
    wc = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = ranked.withColumn("cum_rel", F.sum("rel").over(wc))
    k = F.lit(_K)
    return hits.groupBy("query_id").agg(
        r6(
            F.when(
                F.least(F.sum("rel"), k) > 0,
                F.sum(
                    F.when(
                        (F.col("rel") == 1) & (F.col("rn") <= _K),
                        F.col("cum_rel").cast("double") / F.col("rn"),
                    ).otherwise(0.0)
                )
                / F.least(F.sum("rel"), k),
            ).otherwise(0.0)
        ).alias("ap_at_10"),
        r6(
            F.sum(F.when(F.col("rn") <= _K, F.col("rel")).otherwise(0))
            / k.cast("double")
        ).alias("p_at_10"),
        r6(
            F.when(
                F.sum("rel") > 0,
                F.sum(F.when(F.col("rn") <= _K, F.col("rel")).otherwise(0))
                / F.sum("rel").cast("double"),
            ).otherwise(0.0)
        ).alias("recall_at_10"),
    )


@query(
    "ml_mrr",
    oracle=f"""
    WITH {_RANKED_SQL}
    SELECT query_id,
           round(coalesce(1.0 / min(CASE WHEN rel = 1 THEN rn END), 0), 6)
             AS reciprocal_rank,
           CAST(coalesce(min(CASE WHEN rel = 1 THEN rn END), 0) AS BIGINT)
             AS first_hit_rank
    FROM ranked GROUP BY query_id
    """,
)
def ml_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first relevant item per query (0 when the
    query has none) — the metric of record for known-item search; one
    keyed min over the shared ranking."""
    ranked = _ranked(spark, sf_dir)
    first_hit = F.min(F.when(F.col("rel") == 1, F.col("rn")))
    return ranked.groupBy("query_id").agg(
        r6(F.coalesce(F.lit(1.0) / first_hit, F.lit(0.0))).alias("reciprocal_rank"),
        F.coalesce(first_hit, F.lit(0)).cast("bigint").alias("first_hit_rank"),
    )
