"""§2 round-8 batch EP — skip-gram pair extraction + exact Wasserstein
drift.

- ``events_skipgram_pairs``: the word2vec data-prep verb over behavior
  sequences — (center, context) pair counts within a ±2 window of each
  user's event stream, plus the subsampling keep-probability
  min(1, √(t/f) + t/f) (Mikolov et al.'s frequent-token downweighting,
  t = 10⁻³) every skip-gram pipeline computes before training.
  Behavior2vec/item2vec pipelines are exactly this extraction at 100 TB.
- ``ml_wasserstein_drift``: exact 1-D Wasserstein-1 distance between
  two empirical distributions (reference = even order keys, current =
  odd): W₁ = ∫|F₁ − F₂|dx computed exactly as Σ |ΔCDF|·gap over the
  merged sorted support — the drift metric that, unlike PSI/KS, is in
  the UNITS of the variable (dollars here) and sees magnitude, not just
  rank, of the shift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_T = 1e-3  # word2vec subsampling threshold


@query(
    "events_skipgram_pairs",
    oracle=f"""
    WITH seqd AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS c1,
             lead(event_type, 2) OVER w AS c2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pairs AS (
      SELECT event_type AS center, c1 AS context, 1 AS dist
      FROM seqd WHERE c1 IS NOT NULL
      UNION ALL
      SELECT event_type, c2, 2 FROM seqd WHERE c2 IS NOT NULL
      UNION ALL
      SELECT c1, event_type, 1 FROM seqd WHERE c1 IS NOT NULL
      UNION ALL
      SELECT c2, event_type, 2 FROM seqd WHERE c2 IS NOT NULL
    ),
    freq AS (
      SELECT event_type, count(*) * 1.0
               / (SELECT count(*) FROM events) AS f
      FROM events GROUP BY event_type
    )
    SELECT p.center, p.context, CAST(p.dist AS INT) AS dist,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(least(1.0, sqrt({_T} / fc.f) + {_T} / fc.f), 6)
               AS center_keep_p
    FROM pairs p JOIN freq fc ON fc.event_type = p.center
    GROUP BY p.center, p.context, p.dist, fc.f
    """,
)
def events_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from user event sequences: every
    (center, context) co-occurrence within ±2 positions (symmetric —
    each forward lead also emits the mirrored pair), counted at
    (center, context, distance) grain, with the word2vec subsampling
    keep-probability for the center token (min(1, √(t/f) + t/f),
    t = 10⁻³, f = the token's corpus frequency share). Two leads
    instead of a self-join: the window pass IS the pair enumeration.
    Pair-count symmetry (n(a,b,d) = n(b,a,d)) is pinned.

    Scale: ONE user-keyed window pass over events (the sessionization
    shuffle) emits all pairs map-side; the aggregation is
    (types² × window) grain — metadata for any real vocabulary of
    behaviors; item2vec over billions of sessions is this exact plan
    with a bigger shuffle."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("c1"),
        F.lead("event_type", 2).over(w).alias("c2"),
    )
    p1 = seqd.filter(F.col("c1").isNotNull())
    p2 = seqd.filter(F.col("c2").isNotNull())
    pairs = (
        p1.select(F.col("event_type").alias("center"), F.col("c1").alias("context"), F.lit(1).alias("dist"))
        .unionAll(p2.select(F.col("event_type"), F.col("c2"), F.lit(2)))
        .unionAll(p1.select(F.col("c1"), F.col("event_type"), F.lit(1)))
        .unionAll(p2.select(F.col("c2"), F.col("event_type"), F.lit(2)))
    )
    total = e.count()  # 1-row scalar (bounded)
    freq = e.groupBy("event_type").agg(
        (F.count(F.lit(1)) * 1.0 / total).alias("f")
    )
    keep = F.least(
        F.lit(1.0), F.sqrt(_T / F.col("f")) + _T / F.col("f")
    )
    return (
        pairs.groupBy("center", "context", "dist")
        .agg(bi(F.count(F.lit(1))).alias("n_pairs"))
        .join(
            F.broadcast(freq.select(F.col("event_type").alias("center"), "f")),
            "center",
        )
        .select(
            "center",
            "context",
            F.col("dist").cast("int").alias("dist"),
            "n_pairs",
            r6(keep).alias("center_keep_p"),
        )
    )


@query(
    "ml_wasserstein_drift",
    oracle="""
    WITH tagged AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS ref
      FROM orders
    ),
    tot AS (
      SELECT sum(ref) * 1.0 AS n_ref, sum(1 - ref) * 1.0 AS n_cur
      FROM tagged
    ),
    pts AS (
      SELECT v,
             sum(ref)     AS c_ref,
             sum(1 - ref) AS c_cur
      FROM tagged GROUP BY v
    ),
    cdf AS (
      SELECT v,
             sum(c_ref) OVER (ORDER BY v) AS a_ref,
             sum(c_cur) OVER (ORDER BY v) AS a_cur,
             lead(v) OVER (ORDER BY v) AS v_next
      FROM pts
    )
    SELECT round(sum(abs(a_ref / tot.n_ref - a_cur / tot.n_cur)
                      * (v_next - v)), 6) AS w1,
           CAST(max(tot.n_ref) AS BIGINT) AS n_ref,
           CAST(max(tot.n_cur) AS BIGINT) AS n_cur
    FROM cdf CROSS JOIN tot
    WHERE v_next IS NOT NULL
    """,
)
def ml_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Wasserstein-1 distance between the even-key (reference)
    and odd-key (current) order-price distributions: between
    consecutive distinct values the CDF difference is constant, so
    W₁ = Σ |F_ref − F_cur| · (v_next − v) over the merged sorted
    support — exact, no binning, and in DOLLARS (the average price
    movement needed to morph one distribution into the other), which
    PSI's unitless bins and KS's single max-gap both discard. A planted
    constant-shift pin certifies W₁(X, X+c) = c.

    Scale: one aggregation to the distinct-value grain, then a
    value-ordered running window — the ml_auc_roc class-3 shape; at
    100 TB pre-round values to cents/bins to bound the grain
    (documented; the exact form is already cent-grain here)."""
    o = t(spark, sf_dir, "orders")
    tagged = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(0).alias("ref"),
    )
    pts = tagged.groupBy("v").agg(
        F.sum("ref").alias("c_ref"),
        F.sum(1 - F.col("ref")).alias("c_cur"),
    )
    tot = tagged.agg(
        (F.sum("ref") * 1.0).alias("n_ref"),
        (F.sum(1 - F.col("ref")) * 1.0).alias("n_cur"),
    )
    wv = Window.orderBy("v")
    cdf = pts.select(
        "v",
        F.sum("c_ref").over(wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("a_ref"),
        F.sum("c_cur").over(wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("a_cur"),
        F.lead("v").over(wv).alias("v_next"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .filter(F.col("v_next").isNotNull())
        .agg(
            r6(
                F.sum(
                    F.abs(
                        F.col("a_ref") / F.col("n_ref")
                        - F.col("a_cur") / F.col("n_cur")
                    )
                    * (F.col("v_next") - F.col("v"))
                )
            ).alias("w1"),
            bi(F.max("n_ref")).alias("n_ref"),
            bi(F.max("n_cur")).alias("n_cur"),
        )
    )
