"""§2 round-2 addendum — training-data preparation lane.

Operators a pre-training corpus pipeline runs that were not yet covered by
the dedup / text-analysis / corpus lanes (SURVEY.md §2-J):

- text_pii_redact — regex-based PII masking (emails, long digit runs), the
  mandatory pass before any corpus leaves the ingest zone. Pure per-row
  JVM regex: zero shuffle, stays in whole-stage codegen. The corpus is
  synthetic word-salad with no real PII, so the op plants deterministic
  pseudo-PII first (same construction on both engines) and then removes
  it — the redaction logic, not the data, is under test.
- text_contamination_ngram — benchmark decontamination: flag training
  documents sharing any 4-gram with a held-out eval set. The eval n-gram
  set is corpus-fraction-sized (|eval| ≪ |train|), so the production plan
  is a broadcast semi-structure: train n-grams stream past a broadcast
  eval set; no shuffle of the training corpus. At 100 TB the eval set
  (benchmarks) is KBs–MBs — always broadcastable.
- text_repetition_gopher — Gopher/C4-style repetition quality gates:
  distinct-token fraction, top-token fraction, top-bigram fraction, one
  boolean flag. Cost is one explode + two doc-keyed partial aggs — the
  natural partition key (doc_id) makes this embarrassingly parallel.
- corpus_mix_exact — deterministic domain mixing: downsample every lang
  stratum to the smallest stratum with EXACT integer arithmetic
  (hash(doc) mod n_lang < n_min ⇒ keep-rate n_min/n_lang with zero float
  boundary risk) — the engine-portable twin of split_train_test's bucket
  trick. One count agg + one broadcast join; the corpus itself is
  filtered in place, never shuffled.
- layout_zorder_cluster — Morton (Z-order) interleave of two join/filter
  dimensions + range bucketing, the lakehouse data-layout primitive
  behind multi-dimensional file skipping. The report shows per-bucket
  min/max envelopes of BOTH dims (each bucket bounded in both ⇒ a
  predicate on either dimension prunes most buckets). At 100 TB this is
  `repartitionByRange(zkey).sortWithinPartitions(zkey)` at write time;
  here the bucket id is computed arithmetically so the demonstration is
  engine-portable and needs no global window.
- index_inverted_postings — inverted-index build (term → document
  frequency, total term frequency, sorted posting sample): the search /
  retrieval-side complement of text_tfidf_topk. Two-level partial agg,
  single shuffle keyed by term.
- ts_interpolate_linear — linear interpolation of an event stream onto an
  hourly grid (gap-fill beyond ts_gapfill_locf's step function). The
  union-then-two-windows plan is keyed by user_id: every window is
  partitioned, nothing global, and grid generation is per-key
  `sequence()` — no driver-side loop.

All oracles follow the parity rules of functions/parity.py (r6 rounding of
computed doubles, BIGINT widths, RE2-safe regex subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 / phi)

_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+"
_LONGNUM_RE = "[0-9]{4,}"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ref ' || CAST(doc_id * 7919 AS VARCHAR) AS raw
      FROM documents
    ), step1 AS (
      SELECT doc_id, raw,
             regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g') AS no_email
      FROM dirty
    )
    SELECT doc_id,
           regexp_replace(no_email, '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(no_email, '{_LONGNUM_RE}')) AS BIGINT) AS n_longnum
    FROM step1
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: plant deterministic pseudo-PII (an email and a
    long reference number derived from doc_id), then mask emails and 4+
    digit runs, counting each. Per-row regex only — zero shuffle,
    whole-stage codegen; the RE2-safe pattern subset (char classes +
    bounded quantifiers) evaluates identically on both engines."""
    docs = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    no_email = F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_replace(no_email, _LONGNUM_RE, "<NUM>").alias("redacted"),
        bi(F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), 0))).alias("n_email"),
        bi(F.size(F.regexp_extract_all(no_email, F.lit(_LONGNUM_RE), 0))).alias(
            "n_longnum"
        ),
    )


_NGRAM_N = 4
_EVAL_MOD = 23


@query(
    "text_contamination_ngram",
    oracle=f"""
    WITH l AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS l
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(l) - {_NGRAM_N - 2}),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3])) AS ng
      FROM l
    ), ev AS (
      SELECT DISTINCT ng FROM g WHERE doc_id % {_EVAL_MOD} = 0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_ngrams FROM g GROUP BY doc_id
    ), hits AS (
      SELECT g.doc_id, count(*) AS n_contam
      FROM g JOIN ev USING (ng)
      WHERE g.doc_id % {_EVAL_MOD} != 0
      GROUP BY g.doc_id
    )
    SELECT h.doc_id, h.n_contam, s.n_ngrams,
           round(CAST(h.n_contam AS DOUBLE) / s.n_ngrams, 6) AS contam_frac
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    """,
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id mod 23 != 0) that
    share any word-4-gram with the held-out eval split (doc_id mod 23 = 0).
    The eval n-gram set is broadcast (benchmarks are KB–MB at any corpus
    scale), so the training corpus streams past it with no shuffle of its
    own; per-doc hit counts aggregate on doc_id, the natural partition
    key. Output = contaminated docs only, with overlap count and
    fraction."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - _NGRAM_N),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, _NGRAM_N)),
    )
    g = docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("ng")
    )
    ev = (
        g.where(F.col("doc_id") % _EVAL_MOD == 0)
        .select("ng")
        .distinct()
    )
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        g.where(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(ev), "ng")
        .groupBy("doc_id")
        .agg(bi(F.count(F.lit(1))).alias("n_contam"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_contam",
        bi(F.col("n_ngrams")).alias("n_ngrams"),
        r6(F.col("n_contam") / F.col("n_ngrams")).alias("contam_frac"),
    )


@query(
    "text_repetition_gopher",
    oracle="""
    WITH l AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS l
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS c
      FROM (SELECT doc_id, unnest(l) AS term FROM l)
      GROUP BY doc_id, term
    ), uni AS (
      SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct, max(c) AS top_tf
      FROM tf GROUP BY doc_id
    ), bf AS (
      SELECT doc_id, bigram, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
            FROM l)
      GROUP BY doc_id, bigram
    ), bg AS (
      SELECT doc_id, sum(c) AS n_bg, max(c) AS top_bg
      FROM bf GROUP BY doc_id
    )
    SELECT u.doc_id,
           CAST(u.n_tok AS BIGINT) AS n_tok,
           round(CAST(u.n_distinct AS DOUBLE) / u.n_tok, 6) AS distinct_frac,
           round(CAST(u.top_tf AS DOUBLE) / u.n_tok, 6) AS top_token_frac,
           round(CAST(b.top_bg AS DOUBLE) / b.n_bg, 6) AS top_bigram_frac,
           (CAST(u.n_distinct AS DOUBLE) / u.n_tok < 0.4
            OR CAST(u.top_tf AS DOUBLE) / u.n_tok > 0.12) AS flag_repetitive
    FROM uni u JOIN bg b ON b.doc_id = u.doc_id
    """,
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition gates: per-doc distinct-token fraction,
    top-token fraction, top-bigram fraction, and a repetitive flag
    (distinct_frac < 0.4 OR top_token_frac > 0.12 — thresholds chosen to
    split this corpus' measured quartiles). Flag comparisons run on the
    UNROUNDED ratios, which are identical IEEE divisions of identical
    integers on both engines, so the boolean is engine-portable. Cost:
    one explode + doc-keyed partial aggs — fully parallel on the natural
    key."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("l"))
    tf = (
        base.select("doc_id", F.explode("l").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uni = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tf"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("l")) - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("l"), i + 1, 2)),
    )
    bg = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bg"), F.max("c").alias("top_bg"))
    )
    dfrac = F.col("n_distinct").cast("double") / F.col("n_tok")
    tfrac = F.col("top_tf").cast("double") / F.col("n_tok")
    return uni.join(bg, "doc_id").select(
        "doc_id",
        bi(F.col("n_tok")).alias("n_tok"),
        r6(dfrac).alias("distinct_frac"),
        r6(tfrac).alias("top_token_frac"),
        r6(F.col("top_bg").cast("double") / F.col("n_bg")).alias("top_bigram_frac"),
        ((dfrac < 0.4) | (tfrac > 0.12)).alias("flag_repetitive"),
    )


@query(
    "corpus_mix_exact",
    oracle=f"""
    WITH cnt AS (
      SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
    ), m AS (
      SELECT min(n_before) AS n_min FROM cnt
    ), kept AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d
      JOIN cnt ON cnt.lang = d.lang
      CROSS JOIN m
      WHERE ((d.doc_id * {_KNUTH}) % 4294967296) % cnt.n_before < m.n_min
      GROUP BY d.lang
    )
    SELECT c.lang, CAST(c.n_before AS BIGINT) AS n_before,
           CAST(k.n_kept AS BIGINT) AS n_kept,
           round(CAST(k.n_kept AS DOUBLE) / c.n_before, 6) AS achieved_rate,
           round(CAST((SELECT n_min FROM m) AS DOUBLE) / c.n_before, 6) AS target_rate
    FROM cnt c JOIN kept k ON k.lang = c.lang
    """,
)
def corpus_mix_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixing: downsample every lang stratum toward
    the smallest stratum's size using EXACT integer arithmetic —
    hash(doc_id) mod n_lang < n_min keeps each doc with probability
    n_min/n_lang and zero float-boundary risk (the engine-portable
    multiplicative hash of split_train_test). Plan: one tiny count agg,
    broadcast back onto the corpus, filter in place — the corpus is never
    shuffled, only scanned. Output is the per-stratum audit (before /
    kept / achieved vs target rate), i.e. the mixing report a 100 TB run
    would emit."""
    docs = t(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    n_min = cnt.agg(F.min("n_before").alias("n_min"))
    bucket = F.pmod(F.col("doc_id") * _KNUTH, F.lit(4294967296))
    kept = (
        docs.join(F.broadcast(cnt), "lang")
        .join(F.broadcast(n_min))
        .where(F.pmod(bucket, F.col("n_before")) < F.col("n_min"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        cnt.join(kept, "lang")
        .join(F.broadcast(n_min))
        .select(
            "lang",
            bi(F.col("n_before")).alias("n_before"),
            bi(F.col("n_kept")).alias("n_kept"),
            r6(F.col("n_kept") / F.col("n_before")).alias("achieved_rate"),
            r6(F.col("n_min") / F.col("n_before")).alias("target_rate"),
        )
    )


def _morton_sql(a: str, b: str) -> str:
    """16-bit Morton interleave of the low 8 bits of two integer columns,
    as portable SQL arithmetic (DuckDB and Spark SQL share >> and &)."""
    terms = []
    for i in range(8):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


@query(
    "layout_zorder_cluster",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey % 256 AS pa, l_suppkey % 256 AS sb,
             {_morton_sql("(l_partkey % 256)", "(l_suppkey % 256)")} AS zkey
      FROM lineitem
    )
    SELECT CAST(floor(zkey / 4096) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(pa) AS BIGINT) AS min_part, CAST(max(pa) AS BIGINT) AS max_part,
           CAST(min(sb) AS BIGINT) AS min_supp, CAST(max(sb) AS BIGINT) AS max_supp
    FROM z
    GROUP BY CAST(floor(zkey / 4096) AS BIGINT)
    """,
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data-layout clustering over the two hot lineitem
    filter dimensions. The 16-bit interleave of (partkey, suppkey) low
    bytes is bucketed into 16 z-ranges; the per-bucket min/max envelope
    of BOTH dims shows each bucket bounded in both (the property that
    lets parquet row-group stats prune on EITHER predicate). At 100 TB
    this key feeds `repartitionByRange(zkey).sortWithinPartitions(zkey)`
    at write time — the bucket id here is pure arithmetic (zkey div
    4096), so the demonstration needs no global window or sample-based
    range boundaries."""
    li = t(spark, sf_dir, "lineitem")
    z = li.selectExpr(
        "l_partkey % 256 AS pa",
        "l_suppkey % 256 AS sb",
        f"{_morton_sql('(l_partkey % 256)', '(l_suppkey % 256)')} AS zkey",
    )
    return (
        z.groupBy(F.floor(F.col("zkey") / 4096).cast("long").alias("bucket"))
        .agg(
            bi(F.count(F.lit(1))).alias("n_rows"),
            bi(F.min("pa")).alias("min_part"),
            bi(F.max("pa")).alias("max_part"),
            bi(F.min("sb")).alias("min_supp"),
            bi(F.max("sb")).alias("max_supp"),
        )
    )


@query(
    "index_inverted_postings",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
      FROM documents
    ), tf AS (
      SELECT term, doc_id, count(*) AS c FROM tok GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(c) AS BIGINT) AS tf_total,
           list_slice(list_sort(list(doc_id)), 1, 5) AS posting_sample
    FROM tf
    GROUP BY term
    """,
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency, total term
    frequency, and the first 5 postings (sorted doc_ids) — the
    retrieval-side complement of text_tfidf_topk. Plan: explode + two
    partial aggs, ONE shuffle keyed by term; the posting sample keeps
    output rows O(vocab), never O(corpus). At 100 TB full posting lists
    would be written per term-shard (sink side); the df/tf statistics
    computed here are exactly the index metadata."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("term").agg(
        bi(F.count(F.lit(1))).alias("df"),
        bi(F.sum("c")).alias("tf_total"),
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, 5).alias("posting_sample"),
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, value FROM events WHERE user_id % 50 = 0
    ), bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
      FROM ev GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS t
      FROM bounds
    ), u AS (
      SELECT user_id, t, CAST(NULL AS DOUBLE) AS v, CAST(NULL AS TIMESTAMP) AS ts_ev, 1 AS is_grid
      FROM grid
      UNION ALL
      SELECT user_id, ts AS t, value AS v, ts AS ts_ev, 0 AS is_grid FROM ev
    ), w AS (
      SELECT user_id, t, is_grid,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(ts_ev IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(ts_ev IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
      FROM u
    )
    SELECT user_id, t,
           round(CASE
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_ts > prev_ts THEN
               prev_v + (next_v - prev_v) *
                 (CAST(epoch_us(t) - epoch_us(prev_ts) AS DOUBLE)
                  / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE NULL
           END, 6) AS value_interp
    FROM w
    WHERE is_grid = 1
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the event value stream onto an hourly grid
    (the continuous complement of ts_gapfill_locf's step function), for a
    deterministic user subset. Union-then-two-windows plan: grid points
    and events merge into one user-keyed stream; a forward window carries
    the previous observation, a backward window the next, and the grid
    row interpolates between them (LOCF beyond the last event). Every
    window is partitioned by user_id — nothing global — and the grid is
    per-key `sequence()`, no driver loop. Micro-second integer deltas
    feed the ratio so both engines divide identical integers."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") % 50 == 0)
        .select("user_id", "ts", "value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("t"),
    )
    u = grid.select(
        "user_id",
        "t",
        F.lit(None).cast("double").alias("v"),
        F.lit(None).cast("timestamp").alias("ts_ev"),
        F.lit(1).alias("is_grid"),
    ).unionAll(
        ev.select(
            "user_id",
            F.col("ts").alias("t"),
            F.col("value").alias("v"),
            F.col("ts").alias("ts_ev"),
            F.lit(0).alias("is_grid"),
        )
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id",
        "t",
        "is_grid",
        F.last("v", ignorenulls=True).over(fwd).alias("prev_v"),
        F.last("ts_ev", ignorenulls=True).over(fwd).alias("prev_ts"),
        F.first("v", ignorenulls=True).over(bwd).alias("next_v"),
        F.first("ts_ev", ignorenulls=True).over(bwd).alias("next_ts"),
    )
    ratio = (
        (F.unix_micros("t") - F.unix_micros("prev_ts")).cast("double")
        / (F.unix_micros("next_ts") - F.unix_micros("prev_ts")).cast("double")
    )
    interp = (
        F.when(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("next_ts") > F.col("prev_ts")),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio,
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        w.where(F.col("is_grid") == 1)
        .select("user_id", "t", r6(interp).alias("value_interp"))
    )


@query("emb_pca_power")  # no SQL oracle: iterative linear algebra (rows-only lane)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus via one distributed
    pass + driver-side power iteration. The data-sized work is a single
    mapInPandas over the corpus producing ONE d×d partial Gram matrix per
    partition (Arrow-batched numpy, no per-row Python); the driver
    collects only num_partitions rows of d² doubles (the same bounded
    O(partitions) transfer as pipe_optimize_threshold, never corpus-sized),
    sums them, and power-iterates the tiny d×d matrix to convergence.
    At 100 TB the plan is identical: partial Gram matrices are algebraic
    (mergeable), so the shuffle is |partitions|·d² regardless of corpus
    size — the eigen-solve never touches distributed data. Deterministic:
    fixed start vector, fixed iteration count, sign fixed by the
    largest-magnitude loading. Rows-only lane: no ANSI-SQL twin exists
    for an iterative eigen-solve."""
    import numpy as np
    import pandas as pd

    emb = t(spark, sf_dir, "embeddings").select("embedding")

    def partial_gram(batches):
        g = None
        n = 0
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            if x.size:
                g = x.T @ x if g is None else g + x.T @ x
                n += x.shape[0]
        if g is not None:
            yield pd.DataFrame({"g": [g.ravel().tolist()], "n": [n]})

    parts = emb.mapInPandas(partial_gram, schema="g array<double>, n long")
    rows = parts.collect()  # <= num_partitions rows, each d^2 doubles
    d = 64
    gram = np.zeros((d, d))
    n_total = 0
    for r in rows:
        gram += np.asarray(r["g"]).reshape(d, d)
        n_total += r["n"]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(100):
        v = gram @ v
        v /= np.linalg.norm(v)
    eigval = float(v @ gram @ v) / max(n_total, 1)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    out = [
        (i, round(float(v[i]), 6), round(eigval, 6), n_total) for i in range(d)
    ]
    return spark.createDataFrame(
        out, schema="dim int, loading double, eigval double, n_vectors long"
    )


@query(
    "ml_pit_features",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us, ts
      FROM events
    ), feat AS (
      SELECT event_id, user_id, ts, event_type,
             count(*) OVER w7                                   AS n_prior_7d,
             round(avg(CASE WHEN event_type = 'view' THEN value END) OVER w7, 6)
                                                                AS avg_prior_view_value,
             round((us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) / 1e6, 6)
                                                                AS secs_since_prev
      FROM e
      WINDOW w7 AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, n_prior_7d, avg_prior_view_value, secs_since_prev
    FROM feat WHERE event_type = 'purchase'
    """,
)
def ml_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training features — the leakage-free feature
    extraction an ML pipeline runs to build supervised examples: for every
    'purchase' target row, features come STRICTLY from the past (a
    trailing-7-day RANGE frame ending at 1 µs BEFORE the target, so
    same-microsecond peers are excluded — the classic label-leak), plus
    recency (seconds since previous event, lag ordered by (time, id) for
    tie determinism). One user-keyed shuffle serves both windows; the
    target filter is applied AFTER feature computation so feature windows
    see non-target events too. At 100 TB this is the pattern feature
    stores call 'point-in-time join', here expressed as pure windows —
    no per-target re-scan, no as-of join amplification."""
    from ..functions.parity import um

    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts", um("ts").alias("us")
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-604_800_000_000, -1)
    )
    w_lag = Window.partitionBy("user_id").orderBy("us", "event_id")
    feat = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        bi(F.count(F.lit(1)).over(w7)).alias("n_prior_7d"),
        r6(
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))).over(w7)
        ).alias("avg_prior_view_value"),
        r6((F.col("us") - F.lag("us").over(w_lag)) / F.lit(1e6)).alias(
            "secs_since_prev"
        ),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "n_prior_7d", "avg_prior_view_value", "secs_since_prev"
    )
