"""§2 round-9 batch FL — retrieval data structures + smoothing model
selection.

``text_inverted_index_lookup``: the inverted index AS AN OPERATOR —
postings (token → (doc, tf)) built in one explode-agg pass, the
conjunctive AND query answered by POSTING-LIST INTERSECTION (a join of
the two terms' posting sets on doc_id), which is exactly how
distributed retrieval executes boolean queries: work is O(|posting
lists|), never O(corpus). The query terms are data-derived (top-2
document-frequency tokens of length ≥ 4, ties lexicographic) so the
operator is deterministic without a parameter channel.

``ts_ses_grid_backtest``: model selection for simple exponential
smoothing — the α ∈ {0.1..0.9} grid, each α scored by one-step-ahead
MSE over the daily order-count series via an IN-ROW sequential fold
(state = [level, sse]; both engines execute the same IEEE sequence),
ranked by (mse, α). The forecasting twin of pipe_param_sweep's
grid-search shape: one corpus pass, the grid lives in a 9-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "text_inverted_index_lookup",
    oracle="""
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
      SELECT tok, row_number() OVER (ORDER BY df DESC, tok) AS rk
      FROM df_ QUALIFY rk <= 2
    ),
    qa AS (SELECT tok FROM terms WHERE rk = 1),
    qb AS (SELECT tok FROM terms WHERE rk = 2)
    SELECT a.doc_id,
           CAST(a.tf AS BIGINT) AS tf_a,
           CAST(b.tf AS BIGINT) AS tf_b
    FROM postings a JOIN qa ON a.tok = qa.tok
    JOIN postings b ON b.doc_id = a.doc_id
    JOIN qb ON b.tok = qb.tok
    """,
)
def text_inverted_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) retrieval via posting-list intersection: build
    (token, doc, tf) postings once, derive the two query terms from the
    index itself (top-2 df among tokens of length ≥ 4), intersect their
    posting lists on doc_id. The join touches ONLY the two posting
    lists — the inverted-index contract that makes boolean search
    independent of corpus size. Planted pin: a 3-doc corpus where
    exactly one doc contains both query terms.

    Scale: one token-grain agg builds postings (the text_wordcount
    envelope); the term table is a 2-row broadcast; the intersection
    shuffles only the two posting lists. At 100 TB postings would be
    bucketed by token — the same plan with a co-located join."""
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
    wrk = Window.orderBy(F.col("df").desc(), F.col("tok"))
    terms = (
        dfreq.select("tok", F.row_number().over(wrk).alias("rk"))
        .filter(F.col("rk") <= 2)
    )
    qa = terms.filter(F.col("rk") == 1).select(F.col("tok").alias("tok_a"))
    qb = terms.filter(F.col("rk") == 2).select(F.col("tok").alias("tok_b"))
    pa = postings.join(
        F.broadcast(qa), postings.tok == F.col("tok_a")
    ).select("doc_id", F.col("tf").alias("tf_a"))
    pb = postings.join(
        F.broadcast(qb), postings.tok == F.col("tok_b")
    ).select("doc_id", F.col("tf").alias("tf_b"))
    return pa.join(pb, "doc_id").select(
        "doc_id", bi(F.col("tf_a")).alias("tf_a"), bi(F.col("tf_b")).alias("tf_b")
    )


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
    "ts_ses_grid_backtest",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    ser AS (
      SELECT list(CAST(c AS DOUBLE) ORDER BY i) AS xs,
             count(*) AS n
      FROM idx
    ),
    grid AS (SELECT t10 FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) g(t10)),
    folded AS (
      SELECT t10, n,
             list_reduce(
               list_prepend([xs[1], 0.0e0],
                            list_transform(xs[2:], v -> [v, 0.0e0])),
               (acc, x) -> [
                 (t10 / 10.0) * x[1] + (1 - t10 / 10.0) * acc[1],
                 acc[2] + (x[1] - acc[1]) * (x[1] - acc[1])
               ]) AS st
      FROM ser, grid
    )
    SELECT round(t10 / 10.0, 6) AS alpha,
           round(st[2] / (n - 1), 6) AS mse,
           CAST(row_number() OVER (ORDER BY st[2] / (n - 1), t10)
                AS BIGINT) AS rk
    FROM folded
    ORDER BY alpha
    """,
)
def ts_ses_grid_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SES α-grid one-step-ahead backtest on daily order volume: for
    each α the fold carries [level, sse] — the squared error accrues
    BEFORE the level update (a true out-of-sample one-step error), both
    engines fold the same day-ordered array with literally the same
    expression shapes (DuckDB list_reduce needs a LIST accumulator so
    field 2 sees field 1's PRE-step value — the ts_holt_linear lesson),
    and the 9 (α, MSE) rows rank by (mse, α). Pins: a constant series
    gives MSE 0 at every α; an alternating series is minimized by the
    smallest α (heavy smoothing wins when the signal is mean-reverting).

    Scale: one day rollup; the fold array is calendar-bounded and the
    grid is a 9-row cross join — pipe_param_sweep economics: grid size
    multiplies an in-row fold, not a corpus pass."""
    idx = _daily_idx(spark, sf_dir)
    ser = idx.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
    )
    grid = spark.createDataFrame([(k,) for k in range(1, 10)], "t10 int")
    alpha = F.col("t10") / 10.0
    folded = ser.crossJoin(F.broadcast(grid)).select(
        "t10",
        "n",
        F.aggregate(
            F.slice(F.col("xs"), 2, F.size("xs") - 1),
            F.array(F.element_at(F.col("xs"), 1), F.lit(0.0)),
            lambda acc, x: F.array(
                (F.col("t10") / 10.0) * x
                + (1 - F.col("t10") / 10.0) * acc[0],
                acc[1] + (x - acc[0]) * (x - acc[0]),
            ),
        ).alias("st"),
    )
    mse = F.element_at(F.col("st"), 2) / (F.col("n") - 1)
    wrk = Window.orderBy(mse, F.col("t10"))
    return folded.select(
        r6(alpha).alias("alpha"),
        r6(mse).alias("mse"),
        bi(F.row_number().over(wrk)).alias("rk"),
    ).orderBy("alpha")
