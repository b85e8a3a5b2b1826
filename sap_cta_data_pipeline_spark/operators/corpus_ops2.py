"""§2 round-7 batch CQ — corpus novelty, segmentation & source drift.

Three training-corpus diagnostics the existing text lanes don't cover:

- N-GRAM NOVELTY per document: what fraction of a doc's trigrams first
  appear in THIS doc (vs any earlier doc_id)? The memorization/
  duplication pressure curve — a corpus whose late documents are mostly
  old n-grams teaches nothing new. First-seen resolution is one
  groupBy(ngram) min(doc_id); novelty is a join back at ngram grain.
- SENTENCE segmentation stats: regex-split sentences, per-source
  length distributions — the pretraining-shape profile (mean/median
  sentence length, sentences per doc) that length-filter thresholds are
  read off of.
- JENSEN-SHANNON divergence of each source's unigram distribution from
  the corpus distribution — the symmetric, bounded companion to
  text_kl_divergence_splits: which source is the outlier, in bits.

Scale notes: novelty shuffles at (ngram) then (doc) grain — both keyed,
no windows over the corpus; sentence stats is explode → two keyed aggs;
JS is vocab-grain joins (vocab ≪ corpus) with 1-row-per-source output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "corpus_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    ng AS (
      SELECT doc_id,
             unnest(list_transform(
               list_zip(list_slice(tk, 1, len(tk) - 2),
                        list_slice(tk, 2, len(tk) - 1),
                        list_slice(tk, 3, len(tk))),
               g -> g[1] || ' ' || g[2] || ' ' || g[3])) AS gram
      FROM toks WHERE len(tk) >= 3
    ),
    d AS (SELECT DISTINCT doc_id, gram FROM ng),
    first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM d GROUP BY 1)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_trigrams,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                 / (count(*) * 1.0), 6) AS novelty
    FROM d JOIN first_seen f ON d.gram = f.gram
    GROUP BY 1
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the fraction of a doc's DISTINCT
    trigrams whose first corpus appearance (min doc_id) is this doc.
    Duplicated or boilerplate-heavy late documents score near 0 — the
    curve novelty-vs-doc_id is the 'is the tail of this corpus still
    teaching anything' diagnostic. The corpus is tokenized ONCE:
    first-seen resolves as a gram-partitioned window min over the same
    distinct-gram frame the novelty agg consumes (the groupBy + join-
    back form scans the corpus twice — measured in the plan and
    replaced), so the whole lane is two keyed shuffles: (doc, gram)
    distinct → gram-keyed window → doc-keyed agg. At 100 TB the ngram
    table is the big one — exactly the shape the dedup lanes already
    shuffle."""
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    toks = docs.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 3)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("tk"), i + 1),
                    F.element_at(F.col("tk"), i + 2),
                    F.element_at(F.col("tk"), i + 3),
                ),
            )
        ).alias("gram"),
    ).distinct()
    first_seen = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        grams.withColumn("first_doc", first_seen)
        .groupBy("doc_id")
        .agg(
            bi(F.count(F.lit(1))).alias("n_distinct_trigrams"),
            bi(
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                )
            ).alias("n_novel"),
            r6(
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


@query(
    "text_sentence_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             unnest(list_filter(
               regexp_split_to_array(text, '[.!?]+'),
               x -> trim(x) <> '')) AS sent
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             len(list_filter(string_split(trim(sent), ' '), x -> x <> ''))
               AS n_words
      FROM s
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           round(avg(n_words), 6) AS mean_words,
           CAST(median(n_words) AS DOUBLE) AS median_words,
           CAST(max(n_words) AS BIGINT) AS max_words
    FROM m GROUP BY 1
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-segmentation profile per source: split on terminal
    punctuation runs ([.!?]+), drop empty segments, count words per
    sentence, aggregate mean/median/max and volumes. The shape
    length-filter thresholds are read off of (a source whose median
    sentence is 4 words is boilerplate; 60 is OCR junk). explode →
    ONE keyed agg; the exact median stays safe because the reduce side
    is per-source sentence-length lists bounded by the source's corpus
    share (same argument as agg_median_exact)."""
    docs = t(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split("text", "[.!?]+"), lambda x: F.trim(x) != ""
            )
        ).alias("sent"),
    )
    words = F.size(F.filter(F.split(F.trim(F.col("sent")), " "), lambda x: x != ""))
    m = sents.select("doc_id", "source", words.alias("n_words"))
    return m.groupBy("source").agg(
        bi(F.count(F.lit(1))).alias("n_sentences"),
        bi(F.countDistinct("doc_id")).alias("n_docs"),
        r6(F.avg("n_words")).alias("mean_words"),
        F.expr("percentile(n_words, 0.5)").alias("median_words"),
        bi(F.max("n_words")).alias("max_words"),
    )


@query(
    "text_js_divergence_sources",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    sc AS (SELECT source, w, count(*) * 1.0 AS c FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, sum(c) AS st FROM sc GROUP BY 1),
    ctot AS (SELECT w, sum(c) AS cc FROM sc GROUP BY 1),
    grand AS (SELECT sum(c) AS g FROM sc),
    pq AS (
      SELECT sc.source, sc.c / stot.st AS p, ctot.cc / grand.g AS q
      FROM sc JOIN stot USING (source) JOIN ctot USING (w), grand
    ),
    -- JS = 0.5*KL(p||m) + 0.5*KL(q||m), m = (p+q)/2; the q-side needs
    -- ALL vocab terms (p = 0 where the source lacks the term)
    qonly AS (
      SELECT s.source, ctot.cc / grand.g AS q
      FROM (SELECT DISTINCT source FROM sc) s
      CROSS JOIN ctot CROSS JOIN grand
      WHERE NOT EXISTS (SELECT 1 FROM sc
                        WHERE sc.source = s.source AND sc.w = ctot.w)
    )
    SELECT source,
           round(sum(term) / ln(2), 6) AS js_bits
    FROM (
      SELECT source,
             0.5 * p * ln(p / ((p + q) / 2)) + 0.5 * q * ln(q / ((p + q) / 2))
               AS term
      FROM pq
      UNION ALL
      SELECT source, 0.5 * q * ln(q / (q / 2)) AS term FROM qonly
    )
    GROUP BY 1
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits) between each source's unigram
    distribution and the whole-corpus distribution — symmetric and
    bounded by 1 bit, unlike the KL lane (text_kl_divergence_splits),
    so sources are directly comparable. The q-side sum runs over the
    FULL vocabulary: where the source lacks a term (p=0) the mixture
    halves q and the term degenerates to (q/2)·ln 2 — dropping those
    terms understates divergence for small sources, the classic JS
    implementation bug (the oracle enumerates them via an anti-join).
    Vocab-grain joins only; outputs one row per source."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    sc = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("st"))
    ctot = sc.groupBy("w").agg(F.sum("c").alias("cc"))
    grand = sc.agg(F.sum("c").alias("g"))
    pq = (
        sc.join(stot, "source")
        .join(ctot, "w")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "w",
            (F.col("c") / F.col("st")).alias("p"),
            (F.col("cc") / F.col("g")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    present = pq.select(
        "source",
        (
            0.5 * F.col("p") * F.log(F.col("p") / m)
            + 0.5 * F.col("q") * F.log(F.col("q") / m)
        ).alias("term"),
    )
    # q-only terms: vocab entries the source never saw (p = 0)
    sources = sc.select("source").distinct()
    absent = (
        sources.crossJoin(ctot)
        .join(sc.select("source", "w"), ["source", "w"], "left_anti")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            (
                0.5
                * (F.col("cc") / F.col("g"))
                * F.log(F.lit(2.0))
            ).alias("term"),
        )
    )
    return (
        present.unionByName(absent)
        .groupBy("source")
        .agg(r6(F.sum("term") / F.log(F.lit(2.0))).alias("js_bits"))
    )
