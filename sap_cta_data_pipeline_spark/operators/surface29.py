"""§2 round-8 batch EI — fuzzy benchmark decontamination + image
histogram similarity.

- ``text_contamination_jaccard``: near-duplicate decontamination — the
  fuzzy upgrade of text_contamination_ngram's exact n-gram hit test:
  score every corpus document's 5-gram JACCARD against each benchmark
  document (the benchmark side is small by construction — eval sets are
  KBs–MBs — so its gram set broadcasts), flag docs whose best overlap
  exceeds 0.5. Catches paraphrased/partial eval leakage that exact
  matching misses — the check training pipelines run before shipping a
  corpus.
- ``multimodal_pgm_hist_similarity``: content-based image similarity
  over the REAL PGM codec path — 8-bin intensity histograms from
  encode→parse roundtripped pixels, χ² histogram distance
  (0.5·Σ(a−b)²/(a+b)), label-blocked candidates, top-3 per probe.
  Histogram distances are pure integer arithmetic, so ranking is exact
  on both engines; the image twin of dedup_near_embedding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_N = 5
_CONTAM_THRESHOLD = 0.5
_N_PROBES = 6
_TOPK = 3


@query(
    "text_contamination_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    ng AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(tk) - {_N - 2}),
               i -> list_aggregate(list_slice(tk, i, i + {_N - 1}),
                                   'string_agg', ' '))) AS gram
      FROM toks WHERE len(tk) >= {_N}
    ),
    d AS (SELECT DISTINCT doc_id, gram FROM ng),
    bench AS (SELECT doc_id AS bench_id, gram FROM d WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, gram FROM d WHERE doc_id % 97 <> 0),
    sizes AS (SELECT doc_id, count(*) AS sz FROM d GROUP BY doc_id),
    shared AS (
      SELECT c.doc_id, b.bench_id, count(*) * 1.0 AS inter
      FROM corpus c JOIN bench b USING (gram)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT s.doc_id, s.bench_id,
             s.inter / (cz.sz + bz.sz - s.inter) AS jac,
             row_number() OVER (PARTITION BY s.doc_id
               ORDER BY s.inter / (cz.sz + bz.sz - s.inter) DESC,
                        s.bench_id) AS rk
      FROM shared s
      JOIN sizes cz ON cz.doc_id = s.doc_id
      JOIN sizes bz ON bz.doc_id = s.bench_id
    )
    SELECT doc_id, bench_id AS worst_bench,
           round(jac, 6) AS jaccard,
           jac > {_CONTAM_THRESHOLD} AS contaminated
    FROM scored WHERE rk = 1
    """,
)
def text_contamination_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: each corpus document (doc_id % 97 ≠ 0) is
    scored by 5-gram Jaccard against every benchmark document it shares
    a gram with (benchmark = doc_id % 97 = 0 — the deterministic
    stand-in for an eval set), and the WORST overlap decides the
    contaminated flag at 0.5. Only gram-sharing pairs are ever formed —
    the inverted-index join — and the benchmark gram table broadcasts
    (eval sets are KB–MB at any corpus scale, the bounded-by-construction
    class text_contamination_ngram documents).

    Scale: corpus tokenizes once; the candidate join is gram-keyed with
    the small side broadcast, so cost is Σ shared-gram postings — linear
    in corpus grams for a fixed benchmark. The exact lane IS the scale
    lane here because one side is bounded; a bench set too big to
    broadcast routes to the minhash machinery (documented)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("tk"),
    ).filter(F.size("tk") >= _N)
    ng = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (_N - 1)),
                lambda i: F.array_join(F.slice("tk", i, _N), " "),
            )
        ).alias("gram"),
    ).distinct()
    bench = ng.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    corpus = ng.filter(F.col("doc_id") % 97 != 0)
    sizes = ng.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    shared = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg((F.count(F.lit(1)) * 1.0).alias("inter"))
    )
    cz = sizes.select(F.col("doc_id"), F.col("sz").alias("csz"))
    bz = sizes.select(
        F.col("doc_id").alias("bench_id"), F.col("sz").alias("bsz")
    )
    jac = F.col("inter") / (F.col("csz") + F.col("bsz") - F.col("inter"))
    scored = (
        shared.join(cz, "doc_id")
        .join(F.broadcast(bz), "bench_id")
        .select("doc_id", "bench_id", jac.alias("jac"))
    )
    wrk = Window.partitionBy("doc_id").orderBy(
        F.col("jac").desc(), "bench_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("bench_id").alias("worst_bench"),
            r6(F.col("jac")).alias("jaccard"),
            (F.col("jac") > _CONTAM_THRESHOLD).alias("contaminated"),
        )
    )


def _hist_sql() -> str:
    """DuckDB: 8-bin intensity histogram from the embedding-derived
    pixels (same quantization as the PGM codec oracle)."""
    pix = (
        "list_transform(embedding, x -> CAST(least(greatest("
        "floor((CAST(x AS DOUBLE) + 1.0) * 127.5 + 0.5), 0), 255) AS BIGINT))"
    )
    bins = ", ".join(
        f"list_sum(list_transform({pix}, p -> CASE WHEN p // 32 = {b}"
        f" THEN 1 ELSE 0 END)) AS h{b}"
        for b in range(8)
    )
    return bins


@query(
    "multimodal_pgm_hist_similarity",
    oracle=f"""
    WITH hist AS (
      SELECT vec_id, label, {_hist_sql()}
      FROM embeddings
    ),
    pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             {" + ".join(
                 f"(CASE WHEN p.h{b} + c.h{b} > 0 THEN "
                 f"0.5 * (p.h{b} - c.h{b}) * (p.h{b} - c.h{b})"
                 f" / (p.h{b} + c.h{b}) ELSE 0 END)"
                 for b in range(8)
             )} AS chi2
      FROM hist p JOIN hist c
        ON p.label = c.label AND p.vec_id < {_N_PROBES}
       AND c.vec_id <> p.vec_id
    ),
    ranked AS (
      SELECT probe_id, cand_id, chi2,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY chi2, cand_id) AS rk
      FROM pairs
    )
    SELECT probe_id, cand_id, round(chi2, 6) AS chi2,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TOPK}
    """,
)
def multimodal_pgm_hist_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based image similarity through the REAL codec: each
    8×8 image round-trips encode_pgm → parse_pgm executor-side
    (mapInPandas, Arrow-batched), its 8-bin intensity histogram feeds a
    χ² distance 0.5·Σ(a−b)²/(a+b), candidates are LABEL-blOCKED (the
    multimodal_join discipline — never all-pairs), and each of the 6
    probes keeps its 3 nearest. Distances are rationals of integer
    histogram counts — ranking is exact on both engines (the oracle
    recomputes the histograms straight from the embeddings, certifying
    codec + binning + distance in one hash).

    Scale: histograms reduce every image to 8 ints in one codec pass;
    the pair stage rides the bounded-probe + label-block contract, and
    the full-corpus route buckets histograms (coarse quantized hist as
    the LSH key) before any pairing — the sim_ann_lsh shape."""
    import numpy as np
    import pandas as pd

    from ..functions.multimodal import encode_pgm, parse_pgm

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")

    def run(batches):
        for pdf in batches:
            rows = {"vec_id": [], "label": []}
            for b in range(8):
                rows[f"h{b}"] = []
            for vid, lab, e in zip(pdf["vec_id"], pdf["label"], pdf["embedding"]):
                x = np.asarray(e, dtype=np.float64)
                pix = np.clip(
                    np.floor((x + 1.0) * 127.5 + 0.5), 0, 255
                ).astype(np.uint8).reshape(8, 8)
                img = parse_pgm(encode_pgm(pix)).astype(np.int64)
                hist = np.bincount((img // 32).ravel(), minlength=8)
                rows["vec_id"].append(int(vid))
                rows["label"].append(int(lab))
                for b in range(8):
                    rows[f"h{b}"].append(int(hist[b]))
            yield pd.DataFrame(rows)

    hist = emb.mapInPandas(
        run,
        schema="vec_id bigint, label int, "
        + ", ".join(f"h{b} bigint" for b in range(8)),
    )
    p = hist.filter(F.col("vec_id") < _N_PROBES).alias("p")
    c = hist.alias("c")
    chi2 = F.lit(0.0)
    for b in range(8):
        a, d = F.col(f"p.h{b}"), F.col(f"c.h{b}")
        chi2 = chi2 + F.when(
            a + d > 0, 0.5 * (a - d) * (a - d) / (a + d)
        ).otherwise(0.0)
    pairs = c.join(
        F.broadcast(p),
        (F.col("p.label") == F.col("c.label"))
        & (F.col("c.vec_id") != F.col("p.vec_id")),
    ).select(
        F.col("p.vec_id").alias("probe_id"),
        F.col("c.vec_id").alias("cand_id"),
        chi2.alias("chi2"),
    )
    wrk = Window.partitionBy("probe_id").orderBy("chi2", "cand_id")
    return (
        pairs.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _TOPK)
        .select(
            "probe_id",
            "cand_id",
            r6(F.col("chi2")).alias("chi2"),
            bi(F.col("rk")).alias("rk"),
        )
    )
