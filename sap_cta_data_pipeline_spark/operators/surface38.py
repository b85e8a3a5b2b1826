"""§2 round-8 batch ER — corpus BLEU-2 evaluation.

``text_bleu2_corpus_eval``: corpus-level BLEU with unigram + bigram
modified precision and the brevity penalty (Papineni et al. 2002) —
the generation-eval staple, exercised on a deterministic
candidate/reference pair: the reference is each document, the candidate
the same document with every 7th token dropped (a synthetic "lossy
decode"). Modified precision clips each candidate n-gram's count at its
reference count (the clipping is what stops "the the the" gaming
unigram precision); corpus BLEU sums clipped/total over ALL documents
before the geometric mean — the micro-average the original paper
specifies, not a mean of per-sentence BLEUs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "text_bleu2_corpus_eval",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ref
      FROM documents
    ),
    pair AS (
      SELECT doc_id, ref,
             list_filter(list_transform(range(1, len(ref) + 1),
                           i -> CASE WHEN i % 7 <> 0 THEN ref[i] END),
                         x -> x IS NOT NULL) AS cand
      FROM toks WHERE len(ref) >= 2
    ),
    uni AS (
      SELECT doc_id, u.g AS gram, 'c' AS side FROM pair, unnest(cand) AS u(g)
      UNION ALL
      SELECT doc_id, u.g, 'r' FROM pair, unnest(ref) AS u(g)
    ),
    bi_ AS (
      SELECT doc_id,
             u.g AS gram, 'c' AS side
      FROM pair, unnest(list_transform(range(1, len(cand)),
                        i -> cand[i] || ' ' || cand[i + 1])) AS u(g)
      UNION ALL
      SELECT doc_id, u.g, 'r'
      FROM pair, unnest(list_transform(range(1, len(ref)),
                        i -> ref[i] || ' ' || ref[i + 1])) AS u(g)
    ),
    clip1 AS (
      SELECT sum(least(c, r)) AS clipped, sum(c) AS total FROM (
        SELECT doc_id, gram,
               sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS r
        FROM uni GROUP BY doc_id, gram
      ) WHERE c > 0
    ),
    clip2 AS (
      SELECT sum(least(c, r)) AS clipped, sum(c) AS total FROM (
        SELECT doc_id, gram,
               sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS r
        FROM bi_ GROUP BY doc_id, gram
      ) WHERE c > 0
    ),
    lens AS (
      SELECT sum(len(cand)) * 1.0 AS lc, sum(len(ref)) * 1.0 AS lr
      FROM pair
    )
    SELECT CAST(clip1.total AS BIGINT) AS n_unigrams,
           round(clip1.clipped * 1.0 / clip1.total, 6) AS p1,
           round(clip2.clipped * 1.0 / clip2.total, 6) AS p2,
           round(CASE WHEN lens.lc >= lens.lr THEN 1.0
                      ELSE exp(1 - lens.lr / lens.lc) END, 6) AS bp,
           round(CASE WHEN lens.lc >= lens.lr THEN 1.0
                      ELSE exp(1 - lens.lr / lens.lc) END
                 * exp(0.5 * (ln(clip1.clipped * 1.0 / clip1.total)
                              + ln(clip2.clipped * 1.0 / clip2.total))), 6)
               AS bleu2
    FROM clip1 CROSS JOIN clip2 CROSS JOIN lens
    """,
)
def text_bleu2_corpus_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 of the every-7th-token-dropped candidate against
    the full reference: per (doc, gram) the candidate count clips at
    the reference count, precisions micro-average over the corpus,
    brevity penalty exp(1 − lr/lc) applies because the candidate is
    ~14% shorter, and BLEU-2 is BP·exp(½(ln p₁ + ln p₂)). A planted
    repeat-a-word candidate pins the CLIPPING rule (the degenerate
    candidate scores near zero despite 100% unclipped precision), and
    identity candidates pin BLEU = 1.

    Scale: two gram-grain aggregations ((doc, gram) then global
    sufficient stats) — the text_wordcount envelope twice; corpus BLEU
    over billions of pairs is exactly this plan because the
    micro-average needs only four corpus sums."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ref"),
    ).filter(F.size("ref") >= 2)
    pair = toks.select(
        "doc_id",
        "ref",
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("ref")),
                lambda i: F.when(i % 7 != 0, F.element_at("ref", i)),
            ),
            lambda x: x.isNotNull(),
        ).alias("cand"),
    )

    def grams(col, n):
        if n == 1:
            return col
        return F.transform(
            F.sequence(F.lit(1), F.size(col) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(col, i), F.element_at(col, i + 1)
            ),
        )

    def clipped(n):
        c = pair.select(
            "doc_id", F.explode(grams(F.col("cand"), n)).alias("gram")
        ).groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
        r = pair.select(
            "doc_id", F.explode(grams(F.col("ref"), n)).alias("gram")
        ).groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("r"))
        j = c.join(r, ["doc_id", "gram"], "left").select(
            F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0))).alias("cl"),
            "c",
        )
        return j.agg(
            F.sum("cl").alias("clipped"), F.sum("c").alias("total")
        )

    c1 = clipped(1).select(
        F.col("clipped").alias("cl1"), F.col("total").alias("t1")
    )
    c2 = clipped(2).select(
        F.col("clipped").alias("cl2"), F.col("total").alias("t2")
    )
    lens = pair.agg(
        (F.sum(F.size("cand")) * 1.0).alias("lc"),
        (F.sum(F.size("ref")) * 1.0).alias("lr"),
    )
    p1 = F.col("cl1") * 1.0 / F.col("t1")
    p2 = F.col("cl2") * 1.0 / F.col("t2")
    bp = F.when(F.col("lc") >= F.col("lr"), 1.0).otherwise(
        F.exp(1 - F.col("lr") / F.col("lc"))
    )
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(lens))
        .select(
            bi(F.col("t1")).alias("n_unigrams"),
            r6(p1).alias("p1"),
            r6(p2).alias("p2"),
            r6(bp).alias("bp"),
            r6(bp * F.exp(0.5 * (F.log(p1) + F.log(p2)))).alias("bleu2"),
        )
    )
