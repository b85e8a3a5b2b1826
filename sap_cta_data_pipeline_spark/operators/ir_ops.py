"""§2 round-3 addendum AC — ranked retrieval (BM25).

`text_bm25_topk` completes the IR story the corpus lanes circle around
(wordcount → tfidf → inverted postings): Okapi BM25 scoring of a
deterministic in-query query-term set against the whole corpus, top-20
documents. The plan is the retrieval shape that scales: the query side
is a handful of BROADCAST rows, document length/df statistics are
aggregates, and the only corpus-sized operations are the token scan and
one (doc, term) aggregation — no rank window anywhere (top-k is
TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .text import _tokens

_K1 = 1.2
_B = 0.75


@query(
    "text_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok_f AS (
      SELECT * FROM tok WHERE term != ''
    ), doclen AS (
      SELECT doc_id, count(*) AS dl FROM tok_f GROUP BY doc_id
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             (SELECT avg(dl) FROM doclen) AS avgdl
      FROM documents
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok_f GROUP BY term
    ), qterms AS (
      SELECT term, df FROM (
        SELECT term, df,
               row_number() OVER (ORDER BY df DESC, term ASC) AS rnk
        FROM df
      ) WHERE rnk BETWEEN 6 AND 10
    ), tf AS (
      SELECT f.doc_id, f.term, count(*) AS tf
      FROM tok_f f JOIN qterms q USING (term)
      GROUP BY f.doc_id, f.term
    ), scored AS (
      SELECT tf.doc_id,
             sum(
               ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
             ) AS score
      FROM tf
      JOIN qterms q ON q.term = tf.term
      JOIN doclen d ON d.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 retrieval. The query-term set
    is discovered deterministically in-query (document-frequency ranks
    6–10 — right below the quality_score stopword band) so the operator
    needs no external input; idf uses the +1 Robertson form (always
    positive). Plan: df/doclen/avgdl are aggregates; the 5 query terms
    BROADCAST into the token scan (the corpus never shuffles on
    anything but (doc, term)); the final cut is orderBy(rounded score,
    doc_id) + limit = TakeOrderedAndProject — per-partition heaps, O(k)
    driver rows, no rank window. The rounded-score cutoff keeps the
    top-20 SET engine-deterministic."""
    docs = t(spark, sf_dir, "documents")
    tok = _tokens(docs).select("doc_id", "term")
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).crossJoin(
        doclen.agg(F.avg("dl").alias("avgdl"))
    )
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    top10 = df.orderBy(F.desc("df"), F.asc("term")).limit(10)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    qterms = (
        top10.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk").between(6, 10))
        .select("term", "df")
    )
    tf = (
        tok.join(F.broadcast(qterms.select("term")), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (_K1 + 1)) / denom
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.select("doc_id", r6(F.col("score")).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )
