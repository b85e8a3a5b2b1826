"""§2 round-6 batch BX — training-corpus depth: best-fit packing, token
budgeting, split drift, and link prediction.

- ``pack_sequences_bestfit``: best-fit-decreasing bin packing per lang
  shard (docs never split — the complement of pack_sequences_greedy's
  concat-then-chunk). BFD is inherently sequential, so it runs as ONE
  Arrow-batched applyInPandas per shard; shards are independent, which is
  exactly how packing distributes at 100 TB (pack within shard, never
  globally). Rows-only + fixture pins (capacity, determinism, the
  ceil(total/cap) lower bound).
- ``corpus_token_budget_mix``: deterministic budgeted sampling — per
  source, take docs in multiplicative-hash order until a char budget is
  hit (the "give me ~N tokens of each domain" pipeline op). Fully
  oracled: one keyed window cumsum.
- ``text_kl_divergence_splits``: add-one-smoothed KL(P‖Q) and KL(Q‖P) of
  token distributions between even/odd doc splits, per lang — the drift
  gate run before accepting a new crawl into a mix. Fully oracled over
  the union vocab (full-outer join).
- ``graph_jaccard_link_prediction``: Jaccard neighbor-overlap scores for
  2-hop non-edge pairs of the co-purchase graph, top-20 — the classic
  link-prediction baseline, fully oracled (wedge join + degree join).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .graph_ops import _EDGE_CTE, _edges

_CAP = 512
_KNUTH = 2654435761
_BUDGET_CHARS = 5000


def _bfd(pdf: pd.DataFrame) -> pd.DataFrame:
    """One shard's best-fit-decreasing pass (module-level so tests can
    drive it with hand-built fixtures)."""
    pdf = pdf.sort_values(["n_tok", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    fills: list[int] = []
    assign: list[int] = []
    for n in pdf["n_tok"]:
        # best fit: the fullest bin that still fits (min residual)
        best, best_fill = -1, -1
        for b, f in enumerate(fills):
            if f + n <= _CAP and f > best_fill:
                best, best_fill = b, f
        if best < 0:
            fills.append(0)
            best = len(fills) - 1
        fills[best] += n
        assign.append(best)
    pdf["bin_id"] = pd.Series(assign, dtype="int64")
    pdf["bin_fill"] = pdf["bin_id"].map(lambda b: fills[b]).astype("int64")
    return pdf


@query(
    "pack_sequences_bestfit",
    oracle="""
    WITH items AS (
      SELECT doc_id, lang,
             least(CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                        AS BIGINT), 512) AS n_tok
      FROM documents
    ),
    per_lang AS (
      SELECT lang,
             list(struct_pack(n_tok := n_tok, doc_id := doc_id)
                  ORDER BY n_tok DESC, doc_id ASC) AS its
      FROM items GROUP BY lang
    ),
    folded AS (
      SELECT lang, its,
        list_reduce(
          list_transform(its, it ->
            [CAST(it.n_tok AS BIGINT), CAST(-1 AS BIGINT), CAST(0 AS BIGINT)]),
          (acc, x) -> CASE
            WHEN len(list_filter(list_slice(acc, 1, list_position(acc, -1) - 1), f -> f + x[1] <= 512)) = 0
            THEN list_concat(list_concat(list_append(list_slice(acc, 1, list_position(acc, -1) - 1), x[1]), [CAST(-1 AS BIGINT)]), list_append(list_slice(acc, list_position(acc, -1) + 1, len(acc)), CAST(list_position(acc, -1) - 1 AS BIGINT)))
            ELSE list_concat(list_concat(list_concat(list_concat(list_slice(list_slice(acc, 1, list_position(acc, -1) - 1), 1, list_position(list_slice(acc, 1, list_position(acc, -1) - 1), list_max(list_filter(list_slice(acc, 1, list_position(acc, -1) - 1), f -> f + x[1] <= 512))) - 1), [list_max(list_filter(list_slice(acc, 1, list_position(acc, -1) - 1), f -> f + x[1] <= 512)) + x[1]]), list_slice(list_slice(acc, 1, list_position(acc, -1) - 1), list_position(list_slice(acc, 1, list_position(acc, -1) - 1), list_max(list_filter(list_slice(acc, 1, list_position(acc, -1) - 1), f -> f + x[1] <= 512))) + 1, list_position(acc, -1) - 1)), [CAST(-1 AS BIGINT)]), list_append(list_slice(acc, list_position(acc, -1) + 1, len(acc)), CAST(list_position(list_slice(acc, 1, list_position(acc, -1) - 1), list_max(list_filter(list_slice(acc, 1, list_position(acc, -1) - 1), f -> f + x[1] <= 512))) - 1 AS BIGINT)))
          END) AS st
      FROM per_lang
    ),
    flat AS (
      SELECT lang, st,
             list_position(st, -1) AS d,
             unnest(list_zip(its, list_slice(st, list_position(st, -1) + 1, len(st)))) AS z
      FROM folded
    )
    SELECT z[1].doc_id AS doc_id, lang,
           CAST(z[1].n_tok AS BIGINT) AS n_tok,
           z[2] AS bin_id,
           st[z[2] + 1] AS bin_fill
    FROM flat
    """,
)
def pack_sequences_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing packing, capacity 512 tokens, docs NOT split:
    items sorted by (n_tok DESC, doc_id ASC) drop into the fullest bin
    they fit (ties → lowest bin id); oversize docs are truncated to one
    full bin. Runs per lang shard via applyInPandas — packing quality
    needs only shard-local context, so the lane scales by sharding, and
    each Arrow batch is one shard's (doc_id, n_tok) pairs, never text.
    Pins: per-bin capacity, ceil(Σtok/cap) lower bound, 11/9·OPT+1 BFD
    guarantee vs that bound, determinism, and a hand-packed fixture.
    Round 6: fully VALUE-ORACLED — DuckDB replays the IDENTICAL
    best-fit-decreasing fold (bin state as a single delimiter-encoded
    BIGINT list, because list_reduce struct-of-list accumulators are
    broken in DuckDB 1.0; same fullest-that-fits / first-on-tie rule),
    so the hash certifies every doc's bin assignment and final fill."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    items = docs.select(
        "doc_id", "lang", F.least(bi(n_tok), F.lit(_CAP)).alias("n_tok")
    )
    return (
        items.groupBy("lang")
        .applyInPandas(
            _bfd, "doc_id long, lang string, n_tok long, bin_id long, bin_fill long"
        )
    )


@query(
    "corpus_token_budget_mix",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, n_chars,
             (doc_id * {_KNUTH}) % 4294967296 AS hkey
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_chars, hkey,
             sum(n_chars) OVER (
               PARTITION BY source ORDER BY hkey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_chars
      FROM h
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cum_chars AS BIGINT) AS cum_chars
    FROM c WHERE cum_chars <= {_BUDGET_CHARS}
    """,
)
def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mix sampling: per source, documents in deterministic
    multiplicative-hash order accumulate until the char budget (5000) is
    reached — the "N tokens per domain" selection every pretraining mix
    does, reproducible across runs and engines because the order is a
    pure function of doc_id. One keyed cumsum window; at 100 TB the
    window is per-source and the budget cut makes the output
    budget-bounded, not corpus-bounded."""
    docs = t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        "n_chars",
        ((F.col("doc_id") * _KNUTH) % F.lit(4294967296)).alias("hkey"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.withColumn("cum_chars", F.sum("n_chars").over(w))
    return c.where(F.col("cum_chars") <= _BUDGET_CHARS).select(
        "doc_id", "source", bi(F.col("n_chars")).alias("n_chars"),
        bi(F.col("cum_chars")).alias("cum_chars"),
    )


@query(
    "text_kl_divergence_splits",
    oracle="""
    WITH tok AS (
      SELECT lang, doc_id % 2 AS split,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    cnt AS (
      SELECT lang, term,
             sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
      FROM tok WHERE term != '' GROUP BY lang, term
    ),
    tot AS (
      SELECT lang, count(*) AS v, sum(c0) AS n0, sum(c1) AS n1
      FROM cnt GROUP BY lang
    )
    SELECT c.lang AS lang,
           CAST(t.v AS BIGINT) AS vocab,
           CAST(t.n0 AS BIGINT) AS n_tok_even,
           CAST(t.n1 AS BIGINT) AS n_tok_odd,
           round(sum(((c.c0 + 1.0) / (t.n0 + t.v))
                 * ln(((c.c0 + 1.0) / (t.n0 + t.v))
                      / ((c.c1 + 1.0) / (t.n1 + t.v)))), 6) AS kl_even_odd,
           round(sum(((c.c1 + 1.0) / (t.n1 + t.v))
                 * ln(((c.c1 + 1.0) / (t.n1 + t.v))
                      / ((c.c0 + 1.0) / (t.n0 + t.v)))), 6) AS kl_odd_even
    FROM cnt c JOIN tot t ON c.lang = t.lang
    GROUP BY c.lang, t.v, t.n0, t.n1
    """,
)
def text_kl_divergence_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between even/odd doc splits per lang:
    add-one-smoothed KL in both directions over the UNION vocabulary
    (one conditional-sum agg — no outer join needed once counts carry
    both splits). The acceptance gate before folding a new crawl into an
    existing mix: symmetric near-zero = same distribution. Shapes:
    explode → (lang, term) agg → lang-keyed totals join (≤ langs rows,
    broadcast) → keyed sum."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        (F.col("doc_id") % 2).alias("split"),
        F.explode(F.split("text", " ")).alias("term"),
    ).where(F.col("term") != "")
    cnt = tok.groupBy("lang", "term").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).alias("c1"),
    )
    tot = cnt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
    )
    j = cnt.join(F.broadcast(tot), "lang")
    p = (F.col("c0") + 1.0) / (F.col("n0") + F.col("v"))
    q = (F.col("c1") + 1.0) / (F.col("n1") + F.col("v"))
    return j.groupBy("lang", "v", "n0", "n1").agg(
        r6(F.sum(p * F.log(p / q))).alias("kl_even_odd"),
        r6(F.sum(q * F.log(q / p))).alias("kl_odd_even"),
    ).select(
        "lang",
        bi(F.col("v")).alias("vocab"),
        bi(F.col("n0")).alias("n_tok_even"),
        bi(F.col("n1")).alias("n_tok_odd"),
        "kl_even_odd",
        "kl_odd_even",
    )


@query(
    "graph_jaccard_link_prediction",
    oracle=f"""
    WITH {_EDGE_CTE},
    ud AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u AS node, count(*) AS d FROM ud GROUP BY u),
    wedge AS (
      SELECT a.u AS x, b.u AS y, count(*) AS common
      FROM ud a JOIN ud b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    ),
    nonedge AS (
      SELECT w.x, w.y, w.common
      FROM wedge w LEFT JOIN e ON e.u = w.x AND e.v = w.y
      WHERE e.u IS NULL
    ),
    scored AS (
      SELECT n.x, n.y, n.common,
             CAST(n.common AS DOUBLE) / (dx.d + dy.d - n.common) AS jaccard
      FROM nonedge n
      JOIN deg dx ON dx.node = n.x
      JOIN deg dy ON dy.node = n.y
    )
    SELECT CAST(x AS BIGINT) AS u, CAST(y AS BIGINT) AS v,
           CAST(common AS BIGINT) AS common_neighbors,
           round(jaccard, 6) AS jaccard
    FROM scored
    ORDER BY jaccard DESC, u, v
    LIMIT 20
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by Jaccard neighbor overlap: for every 2-hop
    NON-edge pair (x < y), J = |N(x)∩N(y)| / (deg(x)+deg(y)−|∩|); top-20
    candidates. The wedge join is the graph_triangle_count shape (work
    Σ deg², bounded by the co-purchase graph's pruned degrees); the
    anti-join removes existing edges; degrees broadcast. The fully-SQL
    oracle certifies scores, not just ranking."""
    e = _edges(spark, sf_dir)
    ud = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = ud.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("u", "node")
    a = ud.select(F.col("u").alias("x"), F.col("v").alias("w1"))
    b = ud.select(F.col("u").alias("y"), F.col("v").alias("w2"))
    wedge = (
        a.join(b, (F.col("w1") == F.col("w2")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonedge = wedge.join(
        e, (e.u == wedge.x) & (e.v == wedge.y), "left_anti"
    )
    scored = (
        nonedge.join(F.broadcast(deg).withColumnRenamed("node", "x").withColumnRenamed("d", "dx"), "x")
        .join(F.broadcast(deg).withColumnRenamed("node", "y").withColumnRenamed("d", "dy"), "y")
        .select(
            "x",
            "y",
            "common",
            (F.col("common").cast("double") / (F.col("dx") + F.col("dy") - F.col("common"))).alias("jaccard"),
        )
    )
    return (
        scored.orderBy(F.col("jaccard").desc(), "x", "y")
        .limit(20)
        .select(
            F.col("x").cast("bigint").alias("u"),
            F.col("y").cast("bigint").alias("v"),
            bi(F.col("common")).alias("common_neighbors"),
            r6(F.col("jaccard")).alias("jaccard"),
        )
    )
