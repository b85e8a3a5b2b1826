"""§2 round-9 batch EX — training-data curation depth: temperature-
reweighted corpus mixing, Maximal-Marginal-Relevance diverse selection,
and code-vs-prose detection.

- ``corpus_mix_temperature``: the multilingual-sampling staple (mT5 /
  XLM-R style): stratum weights w_l ∝ n_l^τ with τ = 0.5 — computed as
  sqrt(n_l) (IEEE-exact; fractional pow is libm-dependent), token budget
  apportioned by the largest-remainder method on r6-rounded quotas so
  both engines allocate identically and the quotas sum EXACTLY to the
  budget.
- ``emb_mmr_select``: greedy MMR (Carbonell & Goldstein) top-k:
  score(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s). Selection is a
  bounded k-step loop; every cosine is r6-rounded BEFORE the argmax with
  a (score desc, vec_id) total order, so the greedy chain — where one
  flipped comparison would cascade — ranks on identical 6-dp values in
  both engines. The oracle unrolls the identical k steps as CTEs (the
  graph_pagerank/HITS discipline).
- ``text_code_detect``: code-vs-prose heuristic from symbol density,
  code-keyword hits, and indented-line ratio — pure string arithmetic
  (char-class regexp + plain replace counting), the cheap router that
  decides which quality/dedup lane a document enters.

Scale notes (SCALE.md batch EX): mixing is one lang-grain count + a
≤|langs|-row allocation; MMR scores the candidate pool k times with ≤k
broadcast-literal vectors (pool-linear, never pool²); code detection is
one codegen'd map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_BUDGET = 100_000
_TAU_NOTE = "tau = 0.5 (sqrt)"
_LAM = 0.7
_K = 5
_POOL_MOD = 13
_DIM = 64


@query(
    "corpus_mix_temperature",
    oracle=f"""
    WITH cnt AS (
      SELECT lang,
             sum(len(list_filter(string_split(text, ' '), x -> x != '')))
               AS n_tokens
      FROM documents GROUP BY lang
    ), w AS (
      SELECT lang, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS wt FROM cnt
    ), tot AS (SELECT sum(wt) AS wsum FROM w),
    quota AS (
      SELECT lang, n_tokens, wt,
             round({_BUDGET} * wt / wsum, 6) AS q6
      FROM w, tot
    ), parts AS (
      SELECT lang, n_tokens, wt, q6,
             CAST(floor(q6) AS BIGINT) AS base,
             round(q6 - floor(q6), 6) AS rem
      FROM quota
    ), leftover AS (
      SELECT {_BUDGET} - sum(base) AS r FROM parts
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
      FROM parts
    )
    SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(wt, 6) AS weight,
           CAST(base + CASE WHEN rk <= (SELECT r FROM leftover)
                            THEN 1 ELSE 0 END AS BIGINT) AS quota_tokens
    FROM ranked
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted language mix: token quotas ∝ n_l^0.5 over a
    100k-token budget, integerized by largest remainder so Σquota equals
    the budget EXACTLY (pinned) — the sampling table a multilingual
    training run is driven by (τ<1 upweights low-resource strata; τ=1 is
    proportional, τ=0 uniform). sqrt keeps the weights libm-free; quotas
    and remainders are r6-rounded before floor/rank so the allocation is
    engine-identical.

    Scale: one corpus-linear token count to lang grain; the allocation
    runs on ≤|langs| rows (§R class-3 k-row frame)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    cnt = docs.groupBy("lang").agg(F.sum(toks).alias("n_tokens"))
    w = cnt.select(
        "lang", "n_tokens", F.sqrt(F.col("n_tokens").cast("double")).alias("wt")
    )
    tot = w.agg(F.sum("wt").alias("wsum"))
    parts = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_tokens",
            "wt",
            r6(F.lit(_BUDGET) * F.col("wt") / F.col("wsum")).alias("q6"),
        )
        .select(
            "*",
            F.floor("q6").cast("long").alias("base"),
            r6(F.col("q6") - F.floor("q6")).alias("rem"),
        )
    )
    leftover = parts.agg((F.lit(_BUDGET) - F.sum("base")).alias("r"))
    ranked = parts.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("lang")))
        .alias("rk"),
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "lang",
        bi(F.col("n_tokens")).alias("n_tokens"),
        r6(F.col("wt")).alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota_tokens"),
    )


def _dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, {_DIM + 1}), i -> {a}[i] * {b}[i]))"


def _mmr_oracle() -> str:
    ctes = [
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS e FROM embeddings)",
        "n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x)))"
        " AS nrm FROM v)",
        "q AS (SELECT vec_id AS qid, e, nrm FROM n ORDER BY vec_id LIMIT 1)",
        f"""rel AS (
      SELECT c.vec_id, c.e, c.nrm,
             round({_dot_sql('c.e', 'q.e')} / (c.nrm * q.nrm), 6) AS rel
      FROM n c, q
      WHERE c.vec_id % {_POOL_MOD} = 0 AND c.vec_id <> q.qid)""",
        "s1 AS (SELECT vec_id, e, nrm, rel, rel AS score FROM rel"
        " ORDER BY rel DESC, vec_id ASC LIMIT 1)",
        "sel1 AS (SELECT vec_id, e, nrm FROM s1)",
    ]
    for j in range(2, _K + 1):
        ctes.append(
            f"""p{j} AS (
      SELECT r.vec_id,
             max(round({_dot_sql('r.e', 's.e')} / (r.nrm * s.nrm), 6)) AS maxsim
      FROM rel r, sel{j - 1} s
      WHERE r.vec_id NOT IN (SELECT vec_id FROM sel{j - 1})
      GROUP BY r.vec_id)"""
        )
        ctes.append(
            f"""r{j} AS (
      SELECT r.vec_id, r.e, r.nrm, r.rel,
             round({_LAM} * r.rel - {round(1 - _LAM, 6)} * p.maxsim, 6) AS score
      FROM rel r JOIN p{j} p USING (vec_id))"""
        )
        ctes.append(
            f"s{j} AS (SELECT vec_id, e, nrm, rel, score FROM r{j}"
            " ORDER BY score DESC, vec_id ASC LIMIT 1)"
        )
        ctes.append(
            f"sel{j} AS (SELECT vec_id, e, nrm FROM sel{j - 1}"
            f" UNION ALL SELECT vec_id, e, nrm FROM s{j})"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({j} AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,"
        f" score FROM s{j}"
        for j in range(1, _K + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@query("emb_mmr_select", oracle=_mmr_oracle())
def emb_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance selection of k=5 diverse-but-relevant
    vectors from the candidate pool (vec_id ≡ 0 mod 13) against the
    lowest-vec_id query: rank 1 is pure relevance, each later pick
    maximizes λ·rel − (1−λ)·max-sim-to-selected — the dedup-aware
    selection used for eval-set construction and context packing, where
    plain top-k returns five near-duplicates. Every cosine is r6-rounded
    before comparison and ties break on vec_id, so the greedy chain (a
    single flipped argmax would cascade) is engine-deterministic; the
    oracle unrolls the same five steps as CTEs.

    Scale: k passes over the candidate pool, each against ≤k broadcast
    literal vectors (k×64 doubles — bounded driver literals, the
    emb_ivf_kmeans class): pool-LINEAR, never pool², and the pool pass
    is one codegen'd map."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    e = e.select(
        "vec_id",
        "e",
        F.sqrt(
            F.aggregate(
                F.transform("e", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    qrow = e.orderBy("vec_id").limit(1).collect()[0]  # 1-row driver literal
    qvec, qnrm, qid = list(qrow["e"]), float(qrow["nrm"]), int(qrow["vec_id"])

    def _dot_lit(vec: list[float]) -> F.Column:
        lit = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with("e", lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cand = e.filter(
        (F.col("vec_id") % _POOL_MOD == 0) & (F.col("vec_id") != qid)
    ).select(
        "vec_id",
        "e",
        "nrm",
        r6(_dot_lit(qvec) / (F.col("nrm") * F.lit(qnrm))).alias("rel"),
    )
    cand = cand.cache()  # pool-sized; scored k times
    selected: list[tuple[int, list[float], float, float]] = []
    out_rows: list[tuple[int, int, float]] = []
    for j in range(1, _K + 1):
        if not selected:
            scored = cand.select("vec_id", "e", "nrm", "rel", F.col("rel").alias("score"))
        else:
            sims = [
                r6(_dot_lit(sv) / (F.col("nrm") * F.lit(sn)))
                for _, sv, sn, _ in selected
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
            scored = cand.filter(
                ~F.col("vec_id").isin([sid for sid, *_ in selected])
            ).select(
                "vec_id",
                "e",
                "nrm",
                "rel",
                r6(F.lit(_LAM) * F.col("rel") - F.lit(round(1 - _LAM, 6)) * maxsim).alias(
                    "score"
                ),
            )
        picked = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(1).collect()
        if not picked:  # pool smaller than k — select what exists
            break
        top = picked[0]
        selected.append(
            (int(top["vec_id"]), list(top["e"]), float(top["nrm"]), float(top["rel"]))
        )
        out_rows.append((j, int(top["vec_id"]), float(top["score"])))
    cand.unpersist()
    return spark.createDataFrame(
        out_rows, "rank bigint, vec_id bigint, score double"
    )


_CODE_SYMS = "[;{}()\\[\\]=<>]"
_KEYWORDS = ["def ", "return", "import ", "void ", "function "]


@query(
    "text_code_detect",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '{_CODE_SYMS}', '', 'g'))
               AS n_sym,
             ({" + ".join(f"CASE WHEN contains(text, '{k}') THEN 1 ELSE 0 END" for k in _KEYWORDS)})
               AS kw_hits,
             1 + length(text) - length(replace(text, chr(10), '')) AS n_lines,
             (length(text) - length(replace(text, chr(10) || ' ', ''))) / 2
               AS n_indent
      FROM documents WHERE doc_id % 7 = 0 AND length(text) > 0
    )
    SELECT doc_id,
           round(0.6 * (CAST(n_sym AS DOUBLE) / n_chars)
                 + 0.25 * (CAST(kw_hits AS DOUBLE) / {len(_KEYWORDS)})
                 + 0.15 * (CAST(n_indent AS DOUBLE) / n_lines), 6) AS code_score,
           (round(0.6 * (CAST(n_sym AS DOUBLE) / n_chars)
                  + 0.25 * (CAST(kw_hits AS DOUBLE) / {len(_KEYWORDS)})
                  + 0.15 * (CAST(n_indent AS DOUBLE) / n_lines), 6) > 0.05)
             AS is_code
    FROM f
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing heuristic: score = 0.6·symbol-density +
    0.25·keyword-hit fraction + 0.15·indented-line ratio — the cheap
    single-pass router that decides which quality/dedup/tokenizer lane
    a document enters (code wants different thresholds than prose
    everywhere downstream). Counting is char-class regexp + plain
    replace arithmetic (engine-portable); the planted pin plants a real
    code snippet and a prose paragraph on opposite sides of the
    threshold.

    Scale: one codegen'd map pass over the corpus subset; no shuffle at
    all."""
    docs = t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 7 == 0) & (F.length("text") > 0)
    )
    nl = "\n"
    f = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _CODE_SYMS, ""))
        ).alias("n_sym"),
        sum(
            F.when(F.contains("text", F.lit(k)), 1).otherwise(0)
            for k in _KEYWORDS
        ).alias("kw_hits"),
        (
            1 + F.length("text") - F.length(F.replace("text", F.lit(nl), F.lit("")))
        ).alias("n_lines"),
        (
            (
                F.length("text")
                - F.length(F.replace("text", F.lit(nl + " "), F.lit("")))
            )
            / 2
        ).alias("n_indent"),
    )
    score = r6(
        F.lit(0.6) * (F.col("n_sym").cast("double") / F.col("n_chars"))
        + F.lit(0.25) * (F.col("kw_hits").cast("double") / len(_KEYWORDS))
        + F.lit(0.15) * (F.col("n_indent").cast("double") / F.col("n_lines"))
    )
    return f.select(
        "doc_id", score.alias("code_score"), (score > 0.05).alias("is_code")
    )
