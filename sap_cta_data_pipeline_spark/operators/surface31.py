"""§2 round-8 batch EK — TextRank extractive summarization + Flesch
readability.

- ``text_textrank_sentences``: TextRank (Mihalcea & Tarau 2004) — build
  each document's sentence graph (edge weight = shared distinct tokens
  / (ln|Sa| + ln|Sb|), the paper's normalization), run 6 damped
  power iterations of r_i = 0.15 + 0.85·Σ_j (w_ji/outw_j)·r_j over ALL
  documents' graphs at once (edges are intra-doc, so one global edge
  frame partitions itself), and keep each doc's top sentence — the
  extractive-summary primitive corpus curation uses to build
  title/abstract pairs. Value-oracled by unrolling the identical
  iterations (the graph_pagerank discipline).
- ``text_readability_flesch``: Flesch Reading Ease + Flesch-Kincaid
  grade from the classic vowel-group syllable heuristic — the
  readability feature in every corpus quality score since readability
  research moved to data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_D = 0.85
_ITERS = 6

_SENT_CTE = """
    arrs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[.!?]+'),
                         x -> trim(x) <> '') AS arr
      FROM documents
    ),
    sents AS (
      SELECT doc_id, u.i AS sidx,
             list_distinct(list_filter(
               string_split(lower(trim(u.s)), ' '), x -> x <> '')) AS tok
      FROM arrs,
           unnest(list_transform(range(1, len(arr) + 1),
                                 i -> struct_pack(i := i, s := arr[i]))) AS t(u)
    ),
    nodes AS (
      SELECT doc_id, sidx, tok, len(tok) AS n_tok
      FROM sents WHERE len(tok) >= 2
    ),
    edges0 AS (
      SELECT a.doc_id, a.sidx AS src, b.sidx AS dst,
             len(list_intersect(a.tok, b.tok))
               / (ln(a.n_tok) + ln(b.n_tok)) AS w
      FROM nodes a JOIN nodes b
        ON a.doc_id = b.doc_id AND a.sidx < b.sidx
      WHERE len(list_intersect(a.tok, b.tok)) > 0
    ),
    edges AS MATERIALIZED (
      SELECT doc_id, src, dst, w FROM edges0
      UNION ALL
      SELECT doc_id, dst, src, w FROM edges0
    ),
    outw AS MATERIALIZED (
      SELECT doc_id, src, sum(w) AS ow FROM edges GROUP BY 1, 2
    ),
    ew AS MATERIALIZED (
      SELECT e.doc_id, e.src, e.dst, e.w / o.ow AS nw
      FROM edges e JOIN outw o ON e.doc_id = o.doc_id AND e.src = o.src
    ),
    r0 AS MATERIALIZED (
      SELECT doc_id, sidx, 1.0 AS r FROM nodes
    )
"""


def _iter_ctes() -> str:
    out = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        out.append(
            f"""r{k} AS MATERIALIZED (
      SELECT n.doc_id, n.sidx,
             {1 - _D} + {_D} * coalesce(s.acc, 0) AS r
      FROM (SELECT doc_id, sidx FROM nodes) n
      LEFT JOIN (
        SELECT ew.doc_id, ew.dst AS sidx, sum(ew.nw * p.r) AS acc
        FROM ew JOIN {prev} p
          ON p.doc_id = ew.doc_id AND p.sidx = ew.src
        GROUP BY 1, 2
      ) s ON s.doc_id = n.doc_id AND s.sidx = n.sidx
    )"""
        )
        prev = f"r{k}"
    return ",\n".join(out)


@query(
    "text_textrank_sentences",
    oracle=f"""
    WITH {_SENT_CTE},
    {_iter_ctes()},
    ranked AS (
      SELECT doc_id, sidx, r,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(r, 6) DESC, sidx) AS rk,
             count(*) OVER (PARTITION BY doc_id) AS n_sents
      FROM r{_ITERS}
    )
    SELECT doc_id,
           CAST(sidx AS BIGINT) AS top_sentence_idx,
           round(r, 6) AS score,
           CAST(n_sents AS BIGINT) AS n_sentences
    FROM ranked WHERE rk = 1
    """,
)
def text_textrank_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank over every document's sentence graph simultaneously:
    sentences (terminal-punctuation split, distinct lowercase tokens,
    ≥2 tokens), intra-doc edges weighted by shared-token count over
    ln|Sa| + ln|Sb|, symmetric; 6 damped iterations of
    r = 0.15 + 0.85·Σ (w/outw)·r; each doc reports its top sentence
    (rank on ROUNDED score, sidx tiebreak — the geo-lane ranking
    discipline). Isolated sentences keep the base score 0.15. The
    oracle unrolls the same trajectory, hash-certifying scores.

    Scale: every stage is doc-keyed — the pairwise edge build is
    bounded by sentences-per-document (tens), never corpus-wide, and
    each iteration is one keyed join+agg over the edge frame; all
    documents converge in the same 6 passes (the graph_pagerank loop
    shape with doc_id in every key)."""
    docs = t(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", "[.!?]+"), lambda x: F.trim(x) != "")
        ).alias("sidx0", "s"),
    ).select(
        "doc_id",
        (F.col("sidx0") + 1).alias("sidx"),
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim("s")), " "), lambda x: x != ""
            )
        ).alias("tok"),
    )
    nodes = sents.withColumn("n_tok", F.size("tok")).filter(
        F.col("n_tok") >= 2
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok")))
    edges0 = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sidx") < F.col("b.sidx")),
        )
        .filter(inter > 0)
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sidx").alias("src"),
            F.col("b.sidx").alias("dst"),
            (
                inter
                / (F.log(F.col("a.n_tok")) + F.log(F.col("b.n_tok")))
            ).alias("w"),
        )
    )
    edges = edges0.unionAll(
        edges0.select("doc_id", F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    outw = edges.groupBy("doc_id", "src").agg(F.sum("w").alias("ow"))
    ew = edges.join(outw, ["doc_id", "src"]).select(
        "doc_id", "src", "dst", (F.col("w") / F.col("ow")).alias("nw")
    ).localCheckpoint()
    nodelist = nodes.select("doc_id", "sidx").localCheckpoint()
    r = nodelist.withColumn("r", F.lit(1.0))
    for k in range(_ITERS):
        acc = (
            ew.join(
                r.select(
                    "doc_id", F.col("sidx").alias("src"), "r"
                ),
                ["doc_id", "src"],
            )
            .groupBy("doc_id", F.col("dst").alias("sidx"))
            .agg(F.sum(F.col("nw") * F.col("r")).alias("acc"))
        )
        r = nodelist.join(acc, ["doc_id", "sidx"], "left").select(
            "doc_id",
            "sidx",
            (
                F.lit(1 - _D) + _D * F.coalesce(F.col("acc"), F.lit(0.0))
            ).alias("r"),
        )
        if k % 3 == 2:
            r = r.localCheckpoint()
    wrk = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("r"), 6).desc(), "sidx"
    )
    wn = Window.partitionBy("doc_id")
    return (
        r.withColumn("rk", F.row_number().over(wrk))
        .withColumn("n_sents", F.count(F.lit(1)).over(wn))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            bi(F.col("sidx")).alias("top_sentence_idx"),
            r6(F.col("r")).alias("score"),
            bi(F.col("n_sents")).alias("n_sentences"),
        )
    )


@query(
    "text_readability_flesch",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS w,
             len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                             x -> trim(x) <> '')) AS n_sents
      FROM documents
    ),
    syl AS (
      SELECT doc_id, n_sents,
             count(*) AS n_words,
             sum(greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))
                 AS n_syll
      FROM words GROUP BY doc_id, n_sents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syll AS BIGINT) AS n_syllables,
           CAST(n_sents AS BIGINT) AS n_sentences,
           round(206.835 - 1.015 * (n_words * 1.0 / n_sents)
                 - 84.6 * (n_syll * 1.0 / n_words), 6) AS flesch_ease,
           round(0.39 * (n_words * 1.0 / n_sents)
                 + 11.8 * (n_syll * 1.0 / n_words) - 15.59, 6) AS fk_grade
    FROM syl WHERE n_sents > 0 AND n_words > 0
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease and Flesch-Kincaid grade per document using
    the vowel-group syllable heuristic (runs of [aeiouy], minimum one
    per word) — the readability features corpus quality scorers carry
    next to length/punctuation ratios (text_quality_score). Pure
    per-doc arithmetic over token and sentence counts; the canonical
    constants (206.835/1.015/84.6 and 0.39/11.8/−15.59) are the
    published formulas.

    Scale: one explode + one doc-keyed aggregation — the text_wordcount
    envelope; syllable counting is a per-token regex in the JVM."""
    docs = t(spark, sf_dir, "documents")
    n_sents = F.size(
        F.filter(F.split("text", "[.!?]+"), lambda x: F.trim(x) != "")
    )
    words = docs.select(
        "doc_id",
        n_sents.alias("n_sents"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w"),
    )
    syl = words.groupBy("doc_id", "n_sents").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(
            F.greatest(
                F.size(F.expr("regexp_extract_all(w, '[aeiouy]+', 0)")),
                F.lit(1),
            )
        ).alias("n_syll"),
    )
    wps = F.col("n_words") * 1.0 / F.col("n_sents")
    spw = F.col("n_syll") * 1.0 / F.col("n_words")
    return syl.filter((F.col("n_sents") > 0) & (F.col("n_words") > 0)).select(
        "doc_id",
        bi(F.col("n_words")).alias("n_words"),
        bi(F.col("n_syll")).alias("n_syllables"),
        bi(F.col("n_sents")).alias("n_sentences"),
        r6(206.835 - 1.015 * wps - 84.6 * spw).alias("flesch_ease"),
        r6(0.39 * wps + 11.8 * spw - 15.59).alias("fk_grade"),
    )
