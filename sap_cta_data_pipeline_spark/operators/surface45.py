"""§2 round-9 batch FN — rank fusion + extreme-deviation testing.

``ir_rrf_fusion``: Reciprocal Rank Fusion (Cormack et al. 2009) — the
default hybrid-retrieval combiner (BM25 ⊕ vector ranks in every RAG
stack): two term-frequency rankers (the top-2 df-derived query terms'
posting lists, each cut to a top-20 list with deterministic (tf, doc)
tie-breaks), fused by RRF(d) = Σ_r 1/(60 + rank_r(d)) with the
published k=60, absent-from-one-list documents contributing only the
list they appear in. Fusion happens over the UNION of two k-row lists —
the whole point of RRF is that it never needs score calibration or the
full corpus.

``stats_grubbs_max_dev``: Grubbs' extreme-deviation statistic
G = max|x − x̄|/s over the daily order-count series (population s from
integer sums), with the arg-max day — the single-outlier screen that
complements the distributional tests (MAD flags many; Grubbs asks "is
the single worst day surprising?").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_K = 60
_TOP = 20


@query(
    "ir_rrf_fusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS tok
      FROM documents
    ),
    postings AS (
      SELECT tok, doc_id, count(*) AS tf FROM toks GROUP BY tok, doc_id
    ),
    df_ AS (
      SELECT tok, count(*) AS df FROM postings
      WHERE len(tok) >= 4 GROUP BY tok
    ),
    terms AS (
      SELECT tok, row_number() OVER (ORDER BY df DESC, tok) AS trk
      FROM df_ QUALIFY trk <= 2
    ),
    ra AS (
      SELECT p.doc_id,
             row_number() OVER (ORDER BY p.tf DESC, p.doc_id) AS r
      FROM postings p JOIN terms ON p.tok = terms.tok AND terms.trk = 1
      QUALIFY r <= {_TOP}
    ),
    rb AS (
      SELECT p.doc_id,
             row_number() OVER (ORDER BY p.tf DESC, p.doc_id) AS r
      FROM postings p JOIN terms ON p.tok = terms.tok AND terms.trk = 2
      QUALIFY r <= {_TOP}
    ),
    fused AS (
      SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
             ra.r AS r_a, rb.r AS r_b,
             coalesce(1.0 / ({_K} + ra.r), 0.0)
               + coalesce(1.0 / ({_K} + rb.r), 0.0) AS rrf
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, CAST(r_a AS BIGINT) AS r_a, CAST(r_b AS BIGINT) AS r_b,
           round(rrf, 6) AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def ir_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF over two term-frequency rankers: each query term's posting
    list cuts to a deterministic top-20 (tf DESC, doc_id), the two
    k-row lists full-outer-join on doc_id, and RRF = Σ 1/(60+rank)
    (absent list ⇒ 0 term) picks the final top-10. Planted pin: a doc
    ranked 1st in BOTH lists beats a doc ranked 1st in one and absent
    from the other (1/61 + 1/61 > 1/61) — the consensus property RRF
    exists for.

    Scale: the corpus is touched once to build postings; ranking cuts
    are per-term TakeOrdered top-k; fusion joins two 20-row frames —
    driver-trivial at any corpus size."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    postings = toks.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        postings.filter(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    wtrk = Window.orderBy(F.col("df").desc(), F.col("tok"))
    terms = dfreq.select(
        "tok", F.row_number().over(wtrk).alias("trk")
    ).filter(F.col("trk") <= 2)

    def ranked(trk: int, rname: str) -> DataFrame:
        tq = terms.filter(F.col("trk") == trk).select(
            F.col("tok").alias("qtok")
        )
        wr = Window.orderBy(F.col("tf").desc(), F.col("doc_id"))
        return (
            postings.join(F.broadcast(tq), postings.tok == F.col("qtok"))
            .select("doc_id", "tf")
            .select("doc_id", F.row_number().over(wr).alias(rname))
            .filter(F.col(rname) <= _TOP)
        )

    ra = ranked(1, "r_a")
    rb = ranked(2, "r_b")
    fused = ra.join(rb, "doc_id", "full").select(
        "doc_id",
        "r_a",
        "r_b",
        (
            F.coalesce(1.0 / (_K + F.col("r_a")), F.lit(0.0))
            + F.coalesce(1.0 / (_K + F.col("r_b")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            bi(F.col("r_a")).alias("r_a"),
            bi(F.col("r_b")).alias("r_b"),
            r6(F.col("rrf")).alias("rrf"),
        )
    )


_IDX_SQL = """
      SELECT day, c
      FROM (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS c
            FROM orders GROUP BY 1)
"""


@query(
    "stats_grubbs_max_dev",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    s AS (
      SELECT count(*) AS n, sum(c) AS sx, sum(c * c) AS sx2 FROM idx
    ),
    dev AS (
      SELECT day, c,
             abs(c - CAST(sx AS DOUBLE) / n) AS ad,
             n, sx, sx2
      FROM idx, s
    ),
    top AS (
      SELECT day, c, ad, n, sx, sx2,
             row_number() OVER (ORDER BY ad DESC, day) AS rk
      FROM dev QUALIFY rk = 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(day AS VARCHAR) AS worst_day,
           CAST(c AS BIGINT) AS worst_count,
           round(CAST(sx AS DOUBLE) / n, 6) AS mean,
           round(ad / sqrt(CAST(sx2 AS DOUBLE) / n
                           - (CAST(sx AS DOUBLE) / n)
                             * (CAST(sx AS DOUBLE) / n)), 6) AS g_stat
    FROM top
    """,
)
def stats_grubbs_max_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' G for the single worst daily order count: the arg-max
    absolute deviation (deterministic (deviation, day) tie-break) over
    population σ from integer sums — 'is the worst day a real outlier
    or just the tail of normal variation?'. Planted pin: a lone spike
    in a constant series gives the closed-form
    G = |spike−mean|/σ = sqrt(n−1) · ... verified by direct arithmetic.

    Scale: one day rollup + 1-row moment broadcast + an arg-max
    (day-grain §R class-3 calendar rank)."""
    o = t(spark, sf_dir, "orders")
    idx = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    s = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum(F.col("c") * F.col("c")).alias("sx2"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    dev = idx.crossJoin(F.broadcast(s)).select(
        "day",
        "c",
        F.abs(F.col("c") - mean).alias("ad"),
        "n",
        "sx",
        "sx2",
    )
    wrk = Window.orderBy(F.col("ad").desc(), F.col("day"))
    top = dev.select(
        "*", F.row_number().over(wrk).alias("rk")
    ).filter(F.col("rk") == 1)
    sd = F.sqrt(
        F.col("sx2").cast("double") / F.col("n") - mean * mean
    )
    return top.select(
        bi(F.col("n")).alias("n_days"),
        F.col("day").cast("string").alias("worst_day"),
        bi(F.col("c")).alias("worst_count"),
        r6(mean).alias("mean"),
        r6(F.col("ad") / sd).alias("g_stat"),
    )
