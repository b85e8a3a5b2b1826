"""§2 round-2 addendum — corpus preparation for LLM training data.

Two operators a pre-training data pipeline runs between dedup and the
tokenizer:

- text_normalize — the canonical cleanup pass (casefold, strip
  non-alphanumerics, collapse whitespace). Pure per-row JVM string ops:
  zero shuffle, embarrassingly parallel, the shape that must never leave
  whole-stage codegen. The regex subset is RE2-safe (character classes
  and quantifiers only) so every engine tokenizes identically — the same
  contract as fn_regex.
- pack_sequences_greedy — the concat-then-chunk sequence packing used to
  fill fixed-length training windows: documents are laid out in a
  deterministic order and each starts at the running token offset; its
  bin is offset ÷ budget. Packing is inherently sequential, so the
  parallel unit is the SHARD (here: lang), not the corpus — a running
  sum over Window.partitionBy(shard).orderBy(doc_id) keeps every
  partition independent; no global window exists (SCALE.md global-window
  inventory). At 100 TB the shard key is the corpus shard/file id, which
  is uniform by construction; bin ids are made globally unique by
  prefixing the shard key, exactly as the (lang, bin_id) pair here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_PACK_BUDGET = 512


@query(
    "text_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             concat(upper(source), ' :: ', text, ' ##', CAST(doc_id AS VARCHAR)) AS dirty
      FROM documents
    ), norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9 ]', ' ', 'g'),
                                 '  +', ' ', 'g')) AS norm_text
      FROM raw
    )
    SELECT doc_id, norm_text,
           len(list_filter(string_split(norm_text, ' '), x -> x != '')) AS n_tok_norm
    FROM norm
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text normalization: casefold → strip every
    non-[a-z0-9 ] to space → collapse space runs → trim. The corpus text
    is already clean, so the op normalizes a deliberately dirtied variant
    (upper-cased source tag + '::' separator + '##id' suffix) to prove
    each rule fires. Per-row, shuffle-free, codegen-resident; the regex
    subset is engine-portable by the fn_regex contract."""
    docs = t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.upper("source"), F.lit(" :: "), F.col("text"), F.lit(" ##"),
        F.col("doc_id").cast("string"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(dirty), "[^a-z0-9 ]", " "), "  +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.filter(F.split(norm, " "), lambda x: x != "")).alias("n_tok_norm"),
    ).withColumn("n_tok_norm", bi(F.col("n_tok_norm")))


@query(
    "pack_sequences_greedy",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
      FROM tk
    )
    SELECT doc_id, lang, n_tok,
           CAST((cum - n_tok) // 512 AS BIGINT)    AS bin_id,
           CAST((cum - n_tok) - ((cum - n_tok) // 512) * 512 AS BIGINT) AS offset_in_bin
    FROM c
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: within each lang shard,
    documents in doc_id order are laid end-to-end and each doc's bin is
    its starting token offset ÷ 512 (docs may straddle a boundary — the
    continuous-packing convention; offset_in_bin is where the doc starts
    inside its bin). One keyed window per shard, no global ordering; bin
    ids are shard-local by design ((lang, bin_id) is the global key)."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    w = Window.partitionBy("lang").orderBy("doc_id")
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long")
    bin_id = F.floor(start / F.lit(_PACK_BUDGET))
    return (
        docs.select("doc_id", "lang", bi(n_tok).alias("n_tok"))
        .select(
            "doc_id",
            "lang",
            "n_tok",
            bi(bin_id).alias("bin_id"),
            bi(start - bin_id * _PACK_BUDGET).alias("offset_in_bin"),
        )
    )


_KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 / φ)


@query(
    "sample_weighted_topk",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, lang, n_chars,
             ln((((doc_id * {_KNUTH}) % 4294967296) + 1) / 4294967296.0)
               / n_chars AS key
      FROM documents
    ), r AS (
      SELECT doc_id, lang, n_chars, key,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rn
      FROM k
    )
    SELECT doc_id, lang, n_chars, round(key, 6) AS sample_key
    FROM r WHERE rn <= 10
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis A-ES:
    each doc draws u ∈ (0,1] from the engine-portable multiplicative hash
    of its stable id and competes on key = ln(u)/w (equivalent to u^(1/w);
    here w = n_chars, so longer documents are proportionally likelier).
    Top-10 per language stratum. This is THE distributed weighted-sample
    primitive: no global state, no sequential scan — a projection plus one
    per-stratum top-k, reproducible across engines/runs/topologies because
    the randomness is a pure function of doc_id. At 100 TB the window
    top-k is replaced by the same key with a per-partition heap
    (TakeOrdered per stratum); membership is unchanged."""
    docs = t(spark, sf_dir, "documents")
    u = (F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(4294967296)) + 1) / F.lit(
        4294967296.0
    )
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("key"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("doc_id", "lang", "n_chars", r6(F.col("key")).alias("sample_key"))
    )
