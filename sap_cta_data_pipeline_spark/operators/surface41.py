"""§2 round-9 batch FJ — entity resolution + distribution-free
uncertainty.

``match_fs_weights``: Fellegi-Sunter record-linkage weights — the
probabilistic model every production entity-resolution stack (Splink
et al.) scores with: candidate pairs from a BLOCKED join (nation +
name-prefix block — blocking is what makes linkage O(pairs-in-block)
instead of O(n²)), per-field agreement counted against ground truth
(a deterministically perturbed second source), Laplace-smoothed
m/u probabilities, and the log-likelihood agreement/disagreement
weights ln(m/u), ln((1−m)/(1−u)).

``ml_conformal_interval_eval``: split-conformal prediction intervals —
the distribution-free coverage guarantee: calibration-half absolute
residuals of a per-type mean predictor, the ⌈(n+1)(1−α)⌉-th smallest
residual as the radius (integer k = ((n+1)·9+9)÷10 for α=0.1 — no
binary-0.1 float), and empirical coverage on the held-out half.
Residuals floor to integer cents (the value-grain pre-binning), so
quantile selection is cumulative counting, never a row-level sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_CUT = "2024-01-16"


@query(
    "match_fs_weights",
    oracle="""
    WITH a AS (
      SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nk,
             c_mktsegment AS seg,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal
      FROM customer
    ),
    b AS (
      SELECT k,
             CASE WHEN k % 3 = 0
                  THEN substr(nm, 1, 17) || 'X' ELSE nm END AS nm,
             nk,
             CASE WHEN k % 5 = 0 THEN seg || '_B' ELSE seg END AS seg,
             CASE WHEN k % 7 = 0 THEN bal + 1 ELSE bal END AS bal
      FROM a
    ),
    pairs AS (
      SELECT (a.k = b.k) AS is_match,
             (a.nm = b.nm) AS g1,
             (a.seg = b.seg) AS g2,
             (a.bal = b.bal) AS g3
      FROM a JOIN b
        ON a.nk = b.nk AND substr(a.nm, 1, 15) = substr(b.nm, 1, 15)
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS nm_,
             sum(CASE WHEN is_match AND g1 THEN 1 ELSE 0 END) AS m1,
             sum(CASE WHEN is_match AND g2 THEN 1 ELSE 0 END) AS m2,
             sum(CASE WHEN is_match AND g3 THEN 1 ELSE 0 END) AS m3,
             sum(CASE WHEN NOT is_match AND g1 THEN 1 ELSE 0 END) AS u1,
             sum(CASE WHEN NOT is_match AND g2 THEN 1 ELSE 0 END) AS u2,
             sum(CASE WHEN NOT is_match AND g3 THEN 1 ELSE 0 END) AS u3
      FROM pairs
    ),
    fields AS (
      SELECT 'acctbal' AS field, m3 AS ma, u3 AS ua, n, nm_ FROM s
      UNION ALL
      SELECT 'name', m1, u1, n, nm_ FROM s
      UNION ALL
      SELECT 'segment', m2, u2, n, nm_ FROM s
    )
    SELECT field,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(nm_ AS BIGINT) AS n_match,
           round((ma + 1.0) / (nm_ + 2), 6) AS m_prob,
           round((ua + 1.0) / (n - nm_ + 2), 6) AS u_prob,
           round(ln(((ma + 1.0) / (nm_ + 2))
                    / ((ua + 1.0) / (n - nm_ + 2))), 6) AS w_agree,
           round(ln((1 - (ma + 1.0) / (nm_ + 2))
                    / (1 - (ua + 1.0) / (n - nm_ + 2))), 6) AS w_disagree
    FROM fields
    """,
)
def match_fs_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter m/u weights from a blocked self-linkage: source B
    is customer with deterministic perturbations (every 3rd name's last
    char, every 5th segment, every 7th balance cent), candidates block
    on (nation, 15-char name prefix) — the prefix survives perturbation,
    so recall is 1 by construction — and the labeled agreement counts
    give Laplace-smoothed m/u and the log weights a linkage scorer adds
    per field. Planted pin: a hand-built 4-pair block with known m/u.

    Scale: the ONLY pairing is within blocks (an equi-join on the
    blocking key — Catalyst hash-joins it); block sizes are bounded by
    the key design, which is the entire discipline of production
    linkage. One 1-row sufficient-stat agg, 3-row unpivot final."""
    c = t(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal"),
    )
    b = a.select(
        "k",
        F.when(
            F.col("k") % 3 == 0,
            F.concat(F.substring("nm", 1, 17), F.lit("X")),
        )
        .otherwise(F.col("nm"))
        .alias("nm"),
        "nk",
        F.when(F.col("k") % 5 == 0, F.concat(F.col("seg"), F.lit("_B")))
        .otherwise(F.col("seg"))
        .alias("seg"),
        F.when(F.col("k") % 7 == 0, F.col("bal") + 1)
        .otherwise(F.col("bal"))
        .alias("bal"),
    )
    bb = b.select(
        F.col("k").alias("k2"),
        F.col("nm").alias("nm2"),
        F.col("nk").alias("nk2"),
        F.col("seg").alias("seg2"),
        F.col("bal").alias("bal2"),
    )
    pairs = a.join(
        bb,
        (F.col("nk") == F.col("nk2"))
        & (F.substring("nm", 1, 15) == F.substring("nm2", 1, 15)),
    ).select(
        (F.col("k") == F.col("k2")).alias("is_match"),
        (F.col("nm") == F.col("nm2")).alias("g1"),
        (F.col("seg") == F.col("seg2")).alias("g2"),
        (F.col("bal") == F.col("bal2")).alias("g3"),
    )
    one = F.count(F.lit(1)).alias("n")
    s = pairs.agg(
        one,
        F.sum(F.when(F.col("is_match"), 1).otherwise(0)).alias("nm_"),
        *[
            F.sum(
                F.when(F.col("is_match") & F.col(f"g{i}"), 1).otherwise(0)
            ).alias(f"m{i}")
            for i in (1, 2, 3)
        ],
        *[
            F.sum(
                F.when(~F.col("is_match") & F.col(f"g{i}"), 1).otherwise(0)
            ).alias(f"u{i}")
            for i in (1, 2, 3)
        ],
    )
    fields = None
    for name, mi, ui in (
        ("acctbal", "m3", "u3"),
        ("name", "m1", "u1"),
        ("segment", "m2", "u2"),
    ):
        part = s.select(
            F.lit(name).alias("field"),
            F.col(mi).alias("ma"),
            F.col(ui).alias("ua"),
            "n",
            "nm_",
        )
        fields = part if fields is None else fields.unionAll(part)
    m_p = (F.col("ma") + 1.0) / (F.col("nm_") + 2)
    u_p = (F.col("ua") + 1.0) / (F.col("n") - F.col("nm_") + 2)
    return fields.select(
        "field",
        bi(F.col("n")).alias("n_pairs"),
        bi(F.col("nm_")).alias("n_match"),
        r6(m_p).alias("m_prob"),
        r6(u_p).alias("u_prob"),
        r6(F.log(m_p / u_p)).alias("w_agree"),
        r6(F.log((1 - m_p) / (1 - u_p))).alias("w_disagree"),
    )


@query(
    "ml_conformal_interval_eval",
    oracle=f"""
    WITH x AS (
      SELECT event_type AS typ,
             CAST(round(value * 100, 0) AS BIGINT) AS v,
             (ts >= TIMESTAMP '{_CUT}') AS is_test
      FROM events WHERE value IS NOT NULL
    ),
    fit AS (
      SELECT typ, sum(v) AS sv, count(*) AS n_cal
      FROM x WHERE NOT is_test GROUP BY typ
    ),
    resid AS (
      SELECT x.typ,
             CAST(floor(abs(x.v - CAST(fit.sv AS DOUBLE) / fit.n_cal))
                  AS BIGINT) AS r
      FROM x JOIN fit ON x.typ = fit.typ
      WHERE NOT x.is_test
    ),
    cells AS (
      SELECT typ, r, count(*) AS cnt FROM resid GROUP BY typ, r
    ),
    cum AS (
      SELECT typ, r,
             sum(cnt) OVER (PARTITION BY typ ORDER BY r) AS cum,
             sum(cnt) OVER (PARTITION BY typ) AS n
      FROM cells
    ),
    q AS (
      SELECT typ, min(r) AS q_r
      FROM cum
      WHERE cum >= least(((n + 1) * 9 + 9) // 10, n)
      GROUP BY typ
    ),
    test AS (
      SELECT x.typ,
             CASE WHEN CAST(floor(abs(x.v - CAST(fit.sv AS DOUBLE)
                                      / fit.n_cal)) AS BIGINT) <= q.q_r
                  THEN 1 ELSE 0 END AS covered
      FROM x JOIN fit ON x.typ = fit.typ JOIN q ON x.typ = q.typ
      WHERE x.is_test
    )
    SELECT test.typ AS event_type,
           CAST(any_value(fit.n_cal) AS BIGINT) AS n_cal,
           round(any_value(q.q_r) / 100.0, 6) AS q_alpha,
           CAST(count(*) AS BIGINT) AS n_test,
           round(sum(covered) * 1.0 / count(*), 6) AS coverage
    FROM test JOIN fit ON test.typ = fit.typ JOIN q ON test.typ = q.typ
    GROUP BY test.typ
    """,
)
def ml_conformal_interval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval evaluation (α=0.1) per event type: the
    calibration half's |y − train-mean| residuals floor to cents, the
    radius is the ⌈(n+1)(1−α)⌉-th smallest residual (selected by
    cumulative counts at the residual grain — the value-grain route,
    k clamped to n), and the test half reports empirical coverage —
    the number the distribution-free guarantee says should sit at ≈90%.
    Planted pin: calibration residuals 0..9 with α=0.1 give radius 9
    and full test coverage inside it.

    Scale: two corpus passes (fit agg, test scan) + a per-type
    residual-grain cumulative window; the predictor and radius tables
    are |types|-row broadcasts."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit(_CUT).cast("timestamp")
    x = e.select(
        F.col("event_type").alias("typ"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        (F.col("ts") >= cut).alias("is_test"),
    )
    fit = (
        x.filter(~F.col("is_test"))
        .groupBy("typ")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n_cal"))
    )
    yhat = F.col("sv").cast("double") / F.col("n_cal")
    resid = (
        x.filter(~F.col("is_test"))
        .join(F.broadcast(fit), "typ")
        .select(
            "typ",
            F.floor(F.abs(F.col("v") - yhat)).cast("long").alias("r"),
        )
    )
    cells = resid.groupBy("typ", "r").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("typ").orderBy("r")
    wall = Window.partitionBy("typ")
    cum = cells.select(
        "typ",
        "r",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    k = F.least(
        F.floor(((F.col("n") + 1) * 9 + 9) / 10).cast("long"), F.col("n")
    )
    q = (
        cum.filter(F.col("cum") >= k)
        .groupBy("typ")
        .agg(F.min("r").alias("q_r"))
    )
    test = (
        x.filter(F.col("is_test"))
        .join(F.broadcast(fit), "typ")
        .join(F.broadcast(q), "typ")
        .select(
            "typ",
            "n_cal",
            "q_r",
            F.when(
                F.floor(F.abs(F.col("v") - yhat)).cast("long")
                <= F.col("q_r"),
                1,
            )
            .otherwise(0)
            .alias("covered"),
        )
    )
    return test.groupBy("typ").agg(
        F.any_value(F.col("n_cal")).alias("n_cal0"),
        F.any_value(F.col("q_r")).alias("q_r0"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum("covered").alias("cov"),
    ).select(
        F.col("typ").alias("event_type"),
        bi(F.col("n_cal0")).alias("n_cal"),
        r6(F.col("q_r0") / 100.0).alias("q_alpha"),
        bi(F.col("n_test")).alias("n_test"),
        r6(F.col("cov") * 1.0 / F.col("n_test")).alias("coverage"),
    )
