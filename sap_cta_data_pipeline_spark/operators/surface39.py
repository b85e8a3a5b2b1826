"""§2 round-9 batch FH — lexical diversity + randomness diagnostics.

``text_ttr_mattr``: Moving-Average Type-Token Ratio (Covington & McFall
2010) — the length-robust lexical-diversity score plain TTR is not.
The naive form (distinct count per sliding W-token window, averaged)
is O(n·W) per document; this implementation uses the PREV-OCCURRENCE
identity: token position p is "new" in window start s iff
prev_occurrence(p) < s ≤ p, so Σ_s distinct(s) = Σ_p |valid s-range| —
a CLOSED FORM per token row from one lag over (doc, token) occurrences.
One shuffle to token grain, no per-window work at all.

``ts_permutation_entropy``: Bandt-Pompe ordinal-pattern entropy (order
m=3) of the daily order-count series — the model-free complexity
measure (1 = white noise, 0 = monotone). Patterns come from integer
comparisons of (x_t, x_{t+1}, x_{t+2}) with the ≤-as-earlier tie rule;
the 6-row entropy fold runs as an ORDERED cumulative window so no
cross-row float sum depends on aggregation order.

``stats_runs_test``: Wald-Wolfowitz runs test of the same series around
its mean — "are above/below-mean days independent?": runs counted by a
lag over the day grain, z from the exact closed form
E[R] = 2n₁n₂/n + 1, Var = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_W = 25  # MATTR window (tokens)


@query(
    "text_ttr_mattr",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS v
      FROM documents
    ),
    toks AS (
      SELECT doc_id, len(v) AS n, unnest(v) AS tok,
             unnest(range(1, len(v) + 1)) AS p
      FROM docs WHERE len(v) >= {_W}
    ),
    prevs AS (
      SELECT doc_id, tok, p, n,
             coalesce(lag(p) OVER (PARTITION BY doc_id, tok ORDER BY p), 0)
               AS prev
      FROM toks
    ),
    contrib AS (
      SELECT doc_id, n,
             greatest(0,
               least(p, n - {_W} + 1)
               - greatest(p - {_W} + 1, 1, prev + 1) + 1) AS c,
             CASE WHEN prev = 0 THEN 1 ELSE 0 END AS is_type
      FROM prevs
    )
    SELECT doc_id,
           CAST(any_value(n) AS BIGINT) AS n_tokens,
           round(sum(is_type) * 1.0 / any_value(n), 6) AS ttr,
           round(sum(c) * 1.0
                 / ({_W} * (any_value(n) - {_W} + 1)), 6) AS mattr
    FROM contrib GROUP BY doc_id
    """,
)
def text_ttr_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR(W=25) + plain TTR per document: the sliding-window distinct
    count collapses to a closed form — position p contributes to every
    window start s with prev_occurrence(p) < s ≤ p (clamped to valid
    starts), so ONE lag over (doc, token) occurrences replaces per-window
    distinct counting; MATTR = Σ contributions / (W·(n−W+1)). Integer
    numerators, one double division. Hand-built pins: a constant-token
    doc scores 1/W, an all-distinct doc scores 1.0, and the closed form
    equals the naive per-window count on a small planted doc.

    Scale: explode to token grain (the text_wordcount envelope), one
    (doc, token)-partitioned lag, one doc-grain agg — no W-factor
    anywhere; 100 TB costs the token shuffle, exactly like every other
    token-grain lane."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("v"),
    )
    toks = (
        docs.filter(F.size("v") >= _W)
        .select(
            "doc_id",
            F.size("v").alias("n"),
            F.posexplode(F.col("v")).alias("p0", "tok"),
        )
        .select("doc_id", "n", "tok", (F.col("p0") + 1).alias("p"))
    )
    wprev = Window.partitionBy("doc_id", "tok").orderBy("p")
    prevs = toks.select(
        "doc_id",
        "p",
        "n",
        F.coalesce(F.lag("p").over(wprev), F.lit(0)).alias("prev"),
    )
    contrib = prevs.select(
        "doc_id",
        "n",
        F.greatest(
            F.lit(0),
            F.least(F.col("p"), F.col("n") - _W + 1)
            - F.greatest(F.col("p") - _W + 1, F.lit(1), F.col("prev") + 1)
            + 1,
        ).alias("c"),
        F.when(F.col("prev") == 0, 1).otherwise(0).alias("is_type"),
    )
    return contrib.groupBy("doc_id").agg(
        bi(F.any_value(F.col("n"))).alias("n_tokens"),
        r6(
            F.sum("is_type") * 1.0 / F.any_value(F.col("n"))
        ).alias("ttr"),
        r6(
            F.sum("c") * 1.0 / (_W * (F.any_value(F.col("n")) - _W + 1))
        ).alias("mattr"),
    )


#: shared day-grain order-count series (same contract as timeseries5)
_IDX_SQL = """
      SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS c
            FROM orders GROUP BY 1)
"""


def _daily_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("day")
    return daily.select("day", "c", F.row_number().over(w).alias("i"))


@query(
    "ts_permutation_entropy",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    tri AS (
      SELECT c AS a,
             lead(c, 1) OVER (ORDER BY i) AS b,
             lead(c, 2) OVER (ORDER BY i) AS d
      FROM idx
    ),
    pat AS (
      SELECT CASE
               WHEN a <= b AND b <= d THEN '012'
               WHEN a <= d AND d <  b THEN '021'
               WHEN b <  a AND a <= d THEN '102'
               WHEN d <  a AND a <= b THEN '120'
               WHEN b <= d AND d <  a THEN '201'
               ELSE '210'
             END AS pattern
      FROM tri WHERE b IS NOT NULL AND d IS NOT NULL
    ),
    cnt AS (
      SELECT pattern, count(*) AS cnt FROM pat GROUP BY pattern
    ),
    tot AS (SELECT sum(cnt) AS n FROM cnt)
    SELECT pattern, CAST(cnt AS BIGINT) AS cnt,
           round(CAST(cnt AS DOUBLE) / n, 6) AS p,
           round(sum(-(CAST(cnt AS DOUBLE) / n)
                     * ln(CAST(cnt AS DOUBLE) / n))
                   OVER (ORDER BY pattern) / ln(6.0), 6) AS h_cum
    FROM cnt, tot
    """,
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 Bandt-Pompe permutation entropy of daily order volume:
    each consecutive triple maps to one of 6 ordinal patterns by pure
    integer comparisons (ties rank earlier-position-first, the standard
    ≤ convention), pattern frequencies normalize against the triple
    count, and the entropy accumulates over the PATTERN-ORDERED window
    (−Σ p·ln p / ln 6 — the last h_cum row is the entropy; ordered
    accumulation keeps the 6-term float sum order-deterministic in both
    engines). Monotone series pins H = 0 ('012' only); a period-3
    sawtooth pins the exact 2-pattern entropy.

    Scale: one day rollup; the triple window, pattern agg (≤6 rows),
    and cumulative fold are all day-grain or smaller (§R class-3
    calendar)."""
    idx = _daily_idx(spark, sf_dir)
    wlead = Window.orderBy("i")
    tri = idx.select(
        F.col("c").alias("a"),
        F.lead("c", 1).over(wlead).alias("b"),
        F.lead("c", 2).over(wlead).alias("d"),
    ).filter(F.col("b").isNotNull() & F.col("d").isNotNull())
    a, b, d = F.col("a"), F.col("b"), F.col("d")
    pat = tri.select(
        F.when((a <= b) & (b <= d), "012")
        .when((a <= d) & (d < b), "021")
        .when((b < a) & (a <= d), "102")
        .when((d < a) & (a <= b), "120")
        .when((b <= d) & (d < a), "201")
        .otherwise("210")
        .alias("pattern")
    )
    cnt = pat.groupBy("pattern").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(F.sum("cnt").alias("n"))
    pd_ = F.col("cnt").cast("double") / F.col("n")
    word = Window.orderBy("pattern")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "pattern",
        bi(F.col("cnt")).alias("cnt"),
        r6(pd_).alias("p"),
        r6(
            F.sum(-pd_ * F.log(pd_)).over(word) / F.log(F.lit(6.0))
        ).alias("h_cum"),
    )


@query(
    "stats_runs_test",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    m AS (SELECT sum(c) AS s, count(*) AS n FROM idx),
    signs AS (
      SELECT i, (CAST(c AS DOUBLE) > CAST(m.s AS DOUBLE) / m.n) AS above
      FROM idx, m
      WHERE CAST(c AS DOUBLE) <> CAST(m.s AS DOUBLE) / m.n
    ),
    flips AS (
      SELECT above,
             CASE WHEN lag(above) OVER (ORDER BY i) IS DISTINCT FROM above
                  THEN 1 ELSE 0 END AS flip
      FROM signs
    ),
    s AS (
      SELECT sum(CASE WHEN above THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN above THEN 0 ELSE 1 END) AS n2,
             sum(flip) AS runs
      FROM flips
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(runs AS BIGINT) AS runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z_stat
    FROM s
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on above/below-mean days of daily order
    volume — 'do high-volume days cluster?' (too FEW runs) or alternate
    (too many): runs count as 1 + sign flips via a day-grain lag (the
    first row's NULL lag counts as the opening run), exact-mean days
    drop, and z uses the closed-form moments. The ts_turning_points_test
    companion at the coarser above/below grain. Planted pins: perfectly
    alternating signs (R = n, max z) and two blocks (R = 2, min z).

    Scale: one day rollup + 1-row mean broadcast + day-grain lag (§R
    class-3 calendar) + 1-row final."""
    idx = _daily_idx(spark, sf_dir)
    m = idx.agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n"))
    mean = F.col("s").cast("double") / F.col("n")
    signs = (
        idx.crossJoin(F.broadcast(m))
        .filter(F.col("c").cast("double") != mean)
        .select("i", (F.col("c").cast("double") > mean).alias("above"))
    )
    wlag = Window.orderBy("i")
    flips = signs.select(
        "above",
        F.when(
            ~F.lag("above").over(wlag).eqNullSafe(F.col("above")), 1
        )
        .otherwise(0)
        .alias("flip"),
    )
    s = flips.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).alias("n2"),
        F.sum("flip").alias("runs"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    return s.select(
        bi(n1).alias("n1"),
        bi(n2).alias("n2"),
        bi(F.col("runs")).alias("runs"),
        r6(
            (F.col("runs") - (2.0 * n1 * n2 / nn + 1))
            / F.sqrt(
                2.0
                * n1
                * n2
                * (2.0 * n1 * n2 - nn)
                / (nn.cast("double") * nn * (nn - 1))
            )
        ).alias("z_stat"),
    )
