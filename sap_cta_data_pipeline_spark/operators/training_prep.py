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


@query(
    "emb_pca_power",
    oracle="""
    WITH vv AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    gram AS MATERIALIZED (
      SELECT i.i AS i, j.j AS j, sum(e[i.i] * e[j.j]) AS g
      FROM vv, range(1, 65) i(i), range(1, 65) j(j)
      GROUP BY 1, 2
    ),
    nn AS (SELECT count(*) AS n FROM vv),
    v0 AS MATERIALIZED (SELECT i AS dim, 1.0 / sqrt(64) AS x FROM range(1, 65) t(i)),
    w1 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v0.x) AS x FROM gram g JOIN v0 ON v0.dim = g.j GROUP BY 1),
    v1 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w1)) AS x FROM w1),
    w2 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v1.x) AS x FROM gram g JOIN v1 ON v1.dim = g.j GROUP BY 1),
    v2 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w2)) AS x FROM w2),
    w3 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v2.x) AS x FROM gram g JOIN v2 ON v2.dim = g.j GROUP BY 1),
    v3 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w3)) AS x FROM w3),
    w4 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v3.x) AS x FROM gram g JOIN v3 ON v3.dim = g.j GROUP BY 1),
    v4 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w4)) AS x FROM w4),
    w5 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v4.x) AS x FROM gram g JOIN v4 ON v4.dim = g.j GROUP BY 1),
    v5 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w5)) AS x FROM w5),
    w6 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v5.x) AS x FROM gram g JOIN v5 ON v5.dim = g.j GROUP BY 1),
    v6 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w6)) AS x FROM w6),
    w7 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v6.x) AS x FROM gram g JOIN v6 ON v6.dim = g.j GROUP BY 1),
    v7 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w7)) AS x FROM w7),
    w8 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v7.x) AS x FROM gram g JOIN v7 ON v7.dim = g.j GROUP BY 1),
    v8 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w8)) AS x FROM w8),
    w9 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v8.x) AS x FROM gram g JOIN v8 ON v8.dim = g.j GROUP BY 1),
    v9 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w9)) AS x FROM w9),
    w10 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v9.x) AS x FROM gram g JOIN v9 ON v9.dim = g.j GROUP BY 1),
    v10 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w10)) AS x FROM w10),
    w11 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v10.x) AS x FROM gram g JOIN v10 ON v10.dim = g.j GROUP BY 1),
    v11 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w11)) AS x FROM w11),
    w12 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v11.x) AS x FROM gram g JOIN v11 ON v11.dim = g.j GROUP BY 1),
    v12 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w12)) AS x FROM w12),
    w13 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v12.x) AS x FROM gram g JOIN v12 ON v12.dim = g.j GROUP BY 1),
    v13 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w13)) AS x FROM w13),
    w14 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v13.x) AS x FROM gram g JOIN v13 ON v13.dim = g.j GROUP BY 1),
    v14 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w14)) AS x FROM w14),
    w15 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v14.x) AS x FROM gram g JOIN v14 ON v14.dim = g.j GROUP BY 1),
    v15 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w15)) AS x FROM w15),
    w16 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v15.x) AS x FROM gram g JOIN v15 ON v15.dim = g.j GROUP BY 1),
    v16 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w16)) AS x FROM w16),
    w17 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v16.x) AS x FROM gram g JOIN v16 ON v16.dim = g.j GROUP BY 1),
    v17 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w17)) AS x FROM w17),
    w18 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v17.x) AS x FROM gram g JOIN v17 ON v17.dim = g.j GROUP BY 1),
    v18 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w18)) AS x FROM w18),
    w19 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v18.x) AS x FROM gram g JOIN v18 ON v18.dim = g.j GROUP BY 1),
    v19 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w19)) AS x FROM w19),
    w20 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v19.x) AS x FROM gram g JOIN v19 ON v19.dim = g.j GROUP BY 1),
    v20 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w20)) AS x FROM w20),
    w21 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v20.x) AS x FROM gram g JOIN v20 ON v20.dim = g.j GROUP BY 1),
    v21 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w21)) AS x FROM w21),
    w22 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v21.x) AS x FROM gram g JOIN v21 ON v21.dim = g.j GROUP BY 1),
    v22 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w22)) AS x FROM w22),
    w23 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v22.x) AS x FROM gram g JOIN v22 ON v22.dim = g.j GROUP BY 1),
    v23 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w23)) AS x FROM w23),
    w24 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v23.x) AS x FROM gram g JOIN v23 ON v23.dim = g.j GROUP BY 1),
    v24 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w24)) AS x FROM w24),
    w25 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v24.x) AS x FROM gram g JOIN v24 ON v24.dim = g.j GROUP BY 1),
    v25 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w25)) AS x FROM w25),
    w26 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v25.x) AS x FROM gram g JOIN v25 ON v25.dim = g.j GROUP BY 1),
    v26 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w26)) AS x FROM w26),
    w27 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v26.x) AS x FROM gram g JOIN v26 ON v26.dim = g.j GROUP BY 1),
    v27 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w27)) AS x FROM w27),
    w28 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v27.x) AS x FROM gram g JOIN v27 ON v27.dim = g.j GROUP BY 1),
    v28 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w28)) AS x FROM w28),
    w29 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v28.x) AS x FROM gram g JOIN v28 ON v28.dim = g.j GROUP BY 1),
    v29 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w29)) AS x FROM w29),
    w30 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v29.x) AS x FROM gram g JOIN v29 ON v29.dim = g.j GROUP BY 1),
    v30 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w30)) AS x FROM w30),
    w31 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v30.x) AS x FROM gram g JOIN v30 ON v30.dim = g.j GROUP BY 1),
    v31 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w31)) AS x FROM w31),
    w32 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v31.x) AS x FROM gram g JOIN v31 ON v31.dim = g.j GROUP BY 1),
    v32 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w32)) AS x FROM w32),
    w33 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v32.x) AS x FROM gram g JOIN v32 ON v32.dim = g.j GROUP BY 1),
    v33 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w33)) AS x FROM w33),
    w34 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v33.x) AS x FROM gram g JOIN v33 ON v33.dim = g.j GROUP BY 1),
    v34 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w34)) AS x FROM w34),
    w35 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v34.x) AS x FROM gram g JOIN v34 ON v34.dim = g.j GROUP BY 1),
    v35 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w35)) AS x FROM w35),
    w36 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v35.x) AS x FROM gram g JOIN v35 ON v35.dim = g.j GROUP BY 1),
    v36 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w36)) AS x FROM w36),
    w37 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v36.x) AS x FROM gram g JOIN v36 ON v36.dim = g.j GROUP BY 1),
    v37 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w37)) AS x FROM w37),
    w38 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v37.x) AS x FROM gram g JOIN v37 ON v37.dim = g.j GROUP BY 1),
    v38 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w38)) AS x FROM w38),
    w39 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v38.x) AS x FROM gram g JOIN v38 ON v38.dim = g.j GROUP BY 1),
    v39 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w39)) AS x FROM w39),
    w40 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v39.x) AS x FROM gram g JOIN v39 ON v39.dim = g.j GROUP BY 1),
    v40 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w40)) AS x FROM w40),
    w41 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v40.x) AS x FROM gram g JOIN v40 ON v40.dim = g.j GROUP BY 1),
    v41 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w41)) AS x FROM w41),
    w42 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v41.x) AS x FROM gram g JOIN v41 ON v41.dim = g.j GROUP BY 1),
    v42 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w42)) AS x FROM w42),
    w43 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v42.x) AS x FROM gram g JOIN v42 ON v42.dim = g.j GROUP BY 1),
    v43 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w43)) AS x FROM w43),
    w44 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v43.x) AS x FROM gram g JOIN v43 ON v43.dim = g.j GROUP BY 1),
    v44 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w44)) AS x FROM w44),
    w45 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v44.x) AS x FROM gram g JOIN v44 ON v44.dim = g.j GROUP BY 1),
    v45 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w45)) AS x FROM w45),
    w46 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v45.x) AS x FROM gram g JOIN v45 ON v45.dim = g.j GROUP BY 1),
    v46 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w46)) AS x FROM w46),
    w47 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v46.x) AS x FROM gram g JOIN v46 ON v46.dim = g.j GROUP BY 1),
    v47 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w47)) AS x FROM w47),
    w48 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v47.x) AS x FROM gram g JOIN v47 ON v47.dim = g.j GROUP BY 1),
    v48 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w48)) AS x FROM w48),
    w49 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v48.x) AS x FROM gram g JOIN v48 ON v48.dim = g.j GROUP BY 1),
    v49 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w49)) AS x FROM w49),
    w50 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v49.x) AS x FROM gram g JOIN v49 ON v49.dim = g.j GROUP BY 1),
    v50 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w50)) AS x FROM w50),
    w51 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v50.x) AS x FROM gram g JOIN v50 ON v50.dim = g.j GROUP BY 1),
    v51 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w51)) AS x FROM w51),
    w52 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v51.x) AS x FROM gram g JOIN v51 ON v51.dim = g.j GROUP BY 1),
    v52 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w52)) AS x FROM w52),
    w53 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v52.x) AS x FROM gram g JOIN v52 ON v52.dim = g.j GROUP BY 1),
    v53 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w53)) AS x FROM w53),
    w54 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v53.x) AS x FROM gram g JOIN v53 ON v53.dim = g.j GROUP BY 1),
    v54 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w54)) AS x FROM w54),
    w55 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v54.x) AS x FROM gram g JOIN v54 ON v54.dim = g.j GROUP BY 1),
    v55 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w55)) AS x FROM w55),
    w56 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v55.x) AS x FROM gram g JOIN v55 ON v55.dim = g.j GROUP BY 1),
    v56 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w56)) AS x FROM w56),
    w57 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v56.x) AS x FROM gram g JOIN v56 ON v56.dim = g.j GROUP BY 1),
    v57 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w57)) AS x FROM w57),
    w58 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v57.x) AS x FROM gram g JOIN v57 ON v57.dim = g.j GROUP BY 1),
    v58 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w58)) AS x FROM w58),
    w59 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v58.x) AS x FROM gram g JOIN v58 ON v58.dim = g.j GROUP BY 1),
    v59 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w59)) AS x FROM w59),
    w60 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v59.x) AS x FROM gram g JOIN v59 ON v59.dim = g.j GROUP BY 1),
    v60 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w60)) AS x FROM w60),
    w61 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v60.x) AS x FROM gram g JOIN v60 ON v60.dim = g.j GROUP BY 1),
    v61 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w61)) AS x FROM w61),
    w62 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v61.x) AS x FROM gram g JOIN v61 ON v61.dim = g.j GROUP BY 1),
    v62 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w62)) AS x FROM w62),
    w63 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v62.x) AS x FROM gram g JOIN v62 ON v62.dim = g.j GROUP BY 1),
    v63 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w63)) AS x FROM w63),
    w64 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v63.x) AS x FROM gram g JOIN v63 ON v63.dim = g.j GROUP BY 1),
    v64 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w64)) AS x FROM w64),
    w65 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v64.x) AS x FROM gram g JOIN v64 ON v64.dim = g.j GROUP BY 1),
    v65 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w65)) AS x FROM w65),
    w66 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v65.x) AS x FROM gram g JOIN v65 ON v65.dim = g.j GROUP BY 1),
    v66 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w66)) AS x FROM w66),
    w67 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v66.x) AS x FROM gram g JOIN v66 ON v66.dim = g.j GROUP BY 1),
    v67 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w67)) AS x FROM w67),
    w68 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v67.x) AS x FROM gram g JOIN v67 ON v67.dim = g.j GROUP BY 1),
    v68 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w68)) AS x FROM w68),
    w69 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v68.x) AS x FROM gram g JOIN v68 ON v68.dim = g.j GROUP BY 1),
    v69 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w69)) AS x FROM w69),
    w70 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v69.x) AS x FROM gram g JOIN v69 ON v69.dim = g.j GROUP BY 1),
    v70 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w70)) AS x FROM w70),
    w71 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v70.x) AS x FROM gram g JOIN v70 ON v70.dim = g.j GROUP BY 1),
    v71 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w71)) AS x FROM w71),
    w72 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v71.x) AS x FROM gram g JOIN v71 ON v71.dim = g.j GROUP BY 1),
    v72 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w72)) AS x FROM w72),
    w73 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v72.x) AS x FROM gram g JOIN v72 ON v72.dim = g.j GROUP BY 1),
    v73 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w73)) AS x FROM w73),
    w74 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v73.x) AS x FROM gram g JOIN v73 ON v73.dim = g.j GROUP BY 1),
    v74 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w74)) AS x FROM w74),
    w75 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v74.x) AS x FROM gram g JOIN v74 ON v74.dim = g.j GROUP BY 1),
    v75 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w75)) AS x FROM w75),
    w76 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v75.x) AS x FROM gram g JOIN v75 ON v75.dim = g.j GROUP BY 1),
    v76 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w76)) AS x FROM w76),
    w77 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v76.x) AS x FROM gram g JOIN v76 ON v76.dim = g.j GROUP BY 1),
    v77 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w77)) AS x FROM w77),
    w78 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v77.x) AS x FROM gram g JOIN v77 ON v77.dim = g.j GROUP BY 1),
    v78 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w78)) AS x FROM w78),
    w79 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v78.x) AS x FROM gram g JOIN v78 ON v78.dim = g.j GROUP BY 1),
    v79 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w79)) AS x FROM w79),
    w80 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v79.x) AS x FROM gram g JOIN v79 ON v79.dim = g.j GROUP BY 1),
    v80 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w80)) AS x FROM w80),
    w81 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v80.x) AS x FROM gram g JOIN v80 ON v80.dim = g.j GROUP BY 1),
    v81 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w81)) AS x FROM w81),
    w82 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v81.x) AS x FROM gram g JOIN v81 ON v81.dim = g.j GROUP BY 1),
    v82 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w82)) AS x FROM w82),
    w83 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v82.x) AS x FROM gram g JOIN v82 ON v82.dim = g.j GROUP BY 1),
    v83 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w83)) AS x FROM w83),
    w84 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v83.x) AS x FROM gram g JOIN v83 ON v83.dim = g.j GROUP BY 1),
    v84 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w84)) AS x FROM w84),
    w85 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v84.x) AS x FROM gram g JOIN v84 ON v84.dim = g.j GROUP BY 1),
    v85 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w85)) AS x FROM w85),
    w86 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v85.x) AS x FROM gram g JOIN v85 ON v85.dim = g.j GROUP BY 1),
    v86 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w86)) AS x FROM w86),
    w87 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v86.x) AS x FROM gram g JOIN v86 ON v86.dim = g.j GROUP BY 1),
    v87 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w87)) AS x FROM w87),
    w88 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v87.x) AS x FROM gram g JOIN v87 ON v87.dim = g.j GROUP BY 1),
    v88 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w88)) AS x FROM w88),
    w89 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v88.x) AS x FROM gram g JOIN v88 ON v88.dim = g.j GROUP BY 1),
    v89 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w89)) AS x FROM w89),
    w90 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v89.x) AS x FROM gram g JOIN v89 ON v89.dim = g.j GROUP BY 1),
    v90 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w90)) AS x FROM w90),
    w91 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v90.x) AS x FROM gram g JOIN v90 ON v90.dim = g.j GROUP BY 1),
    v91 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w91)) AS x FROM w91),
    w92 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v91.x) AS x FROM gram g JOIN v91 ON v91.dim = g.j GROUP BY 1),
    v92 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w92)) AS x FROM w92),
    w93 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v92.x) AS x FROM gram g JOIN v92 ON v92.dim = g.j GROUP BY 1),
    v93 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w93)) AS x FROM w93),
    w94 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v93.x) AS x FROM gram g JOIN v93 ON v93.dim = g.j GROUP BY 1),
    v94 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w94)) AS x FROM w94),
    w95 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v94.x) AS x FROM gram g JOIN v94 ON v94.dim = g.j GROUP BY 1),
    v95 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w95)) AS x FROM w95),
    w96 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v95.x) AS x FROM gram g JOIN v95 ON v95.dim = g.j GROUP BY 1),
    v96 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w96)) AS x FROM w96),
    w97 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v96.x) AS x FROM gram g JOIN v96 ON v96.dim = g.j GROUP BY 1),
    v97 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w97)) AS x FROM w97),
    w98 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v97.x) AS x FROM gram g JOIN v97 ON v97.dim = g.j GROUP BY 1),
    v98 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w98)) AS x FROM w98),
    w99 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v98.x) AS x FROM gram g JOIN v98 ON v98.dim = g.j GROUP BY 1),
    v99 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w99)) AS x FROM w99),
    w100 AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v99.x) AS x FROM gram g JOIN v99 ON v99.dim = g.j GROUP BY 1),
    v100 AS MATERIALIZED (SELECT dim, x / sqrt((SELECT sum(x * x) FROM w100)) AS x FROM w100),
    sgn AS (
      SELECT CASE WHEN (SELECT x FROM v100 ORDER BY abs(x) DESC, dim ASC LIMIT 1) < 0
                  THEN -1.0 ELSE 1.0 END AS s
    ),
    eig AS (
      SELECT sum(a.x * g.g * b.x) / (SELECT n FROM nn) AS ev
      FROM gram g JOIN v100 a ON a.dim = g.i JOIN v100 b ON b.dim = g.j
    )
    SELECT CAST(v100.dim - 1 AS INTEGER) AS dim,
           round(v100.x * (SELECT s FROM sgn), 6) AS loading,
           round((SELECT ev FROM eig), 6) AS eigval,
           CAST((SELECT n FROM nn) AS BIGINT) AS n_vectors
    FROM v100
    """,
)
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
    largest-magnitude loading. Round 6: fully VALUE-ORACLED — the oracle
    builds the same raw Gram matrix in SQL and unrolls the identical 100
    power iterations as materialized matvec+normalize CTE pairs, with
    the same argmax-|loading| sign rule; the hash certifies the
    eigenvector AND eigenvalue to 6 decimals."""
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
    out = [(i, float(v[i]), float(eigval), n_total) for i in range(d)]
    raw = spark.createDataFrame(
        out, schema="dim int, loading_raw double, eigval_raw double, n_vectors long"
    )
    # r6 on the DataFrame (half-away-from-zero — the oracle's SQL round),
    # never Python round() (banker's): the markov-rounding discipline
    return raw.select(
        "dim",
        r6(F.col("loading_raw")).alias("loading"),
        r6(F.col("eigval_raw")).alias("eigval"),
        "n_vectors",
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
