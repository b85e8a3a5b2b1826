"""§2 round-3 addendum X — time-series folds, batch sessionization,
k-means, composed corpus gating, and the regexp_extract_all surface.

- ts_ewma_fold — exponentially weighted moving average per user as an
  IN-ROW fold over the time-ordered value list (both engines fold
  sequentially with first-element init, so the float trajectories are
  identical). The recursive definition has no windowed-SQL form; the
  fold form is exact and shuffle-minimal (one groupBy).
- events_sessionize_ids — batch sessionization with explicit session
  ids: gap > 30 min starts a new session (lag + running sum of
  boundary flags), then per-session stats. The row-level-session-id
  twin of stream_session's session_window aggregate.
- emb_kmeans_lloyd — Lloyd's k-means (k=8, 3 iterations,
  deterministic smallest-vec_id init): per iteration ONE broadcast of
  k×64 centroids, in-row argmin assignment (zero shuffle), one
  cell-keyed average. The driver touches only k×d doubles per
  iteration — same bounded-transfer shape as emb_pca_power. Rows-only
  lane (iterative); values pinned in pytest on a planted-cluster
  fixture.
- corpus_filter_verdicts — the composed quality gate every corpus
  pipeline ships: four deterministic rules (length band, mean word
  length band, digit ratio cap, uppercase ratio cap) evaluated in one
  projection, verdict + pipe-joined reason string per document.
- fn_regexp_extract_all — extract-ALL-matches surface (array result):
  match count, first match, and the sorted-distinct head, RE2-safe
  pattern subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_EWMA_ALPHA = 0.2


@query(
    "ts_ewma_fold",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vals
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           round(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc), 6)
             AS ewma
    FROM per_user
    """,
)
def ts_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α = 0.2) of each user's value stream. The recurrence
    S_t = αx_t + (1−α)S_{t−1} has no closed windowed-SQL form without
    overflowing pow((1−α)⁻¹, t); the exact formulation is a sequential
    fold over the time-ordered list — identical first-element-init fold
    semantics on both engines, so the float trajectory (not just the
    rounded tail) matches. One groupBy shuffle; the fold is in-row."""
    e = t(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    per_user = e.groupBy("user_id").agg(
        F.transform(arr, lambda s: s["value"]).alias("vals")
    )
    folded = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(_EWMA_ALPHA) * x + F.lit(1 - _EWMA_ALPHA) * acc,
    )
    return per_user.select(
        "user_id",
        bi(F.size("vals")).alias("n_events"),
        r6(folded).alias("ewma"),
    )


@query(
    "events_sessionize_ids",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(session_id AS BIGINT)     AS session_id,
           CAST(count(*) AS BIGINT)       AS n_events,
           min(ts)                        AS sess_start,
           max(ts)                        AS sess_end,
           round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)
                 / 1000000, 6)            AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def events_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with explicit per-user session ids: a gap
    > 30 min (or stream start) raises a boundary flag (lag), the running
    sum of flags IS the session id, then one keyed agg per session. Two
    user-keyed windows + one agg — all partitioned by user_id, the
    natural key; this is the row-level-id twin of stream_session's
    session_window rollup (which cannot emit per-row ids)."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ -> µs (UTC session)
    gap_ok = t_us - F.lag(t_us).over(w) <= 30 * 60 * 1_000_000
    marked = e.withColumn(
        "new_sess", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = marked.withColumn("session_id", F.sum("new_sess").over(wrun))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            bi(F.count(F.lit(1))).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
            r6(
                (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).cast("double")
                / 1_000_000
            ).alias("duration_s"),
        )
        .select(
            "user_id", bi(F.col("session_id")).alias("session_id"),
            "n_events", "sess_start", "sess_end", "duration_s",
        )
    )


_KMEANS_K = 8
_KMEANS_ITERS = 3


def kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Lloyd's-iteration engine (k=_KMEANS_K, _KMEANS_ITERS rounds,
    deterministic init = the k smallest vec_ids): returns the final
    assignment frame (vec_id, e, cell, d2). Consumed by emb_kmeans_lloyd
    (inertia roll-up) and dedup_semantic (SemDeDup cells)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).cache()
    init = [
        row["e"]
        for row in emb.orderBy("vec_id").limit(_KMEANS_K).collect()
    ]
    centroids = init
    for _ in range(_KMEANS_ITERS):
        cent_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        dists = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with(F.col("e"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        assigned = emb.withColumn("dists_c", dists).select(
            "vec_id",
            "e",
            (F.array_position(F.col("dists_c"), F.array_min("dists_c")) - 1)
            .cast("int")
            .alias("cell"),
            F.array_min("dists_c").alias("d2"),
        )
        new_cents = (
            assigned.select("cell", F.posexplode("e").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("sm"))
            .select("cell", F.transform("sm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        by_cell = {row["cell"]: row["c"] for row in new_cents}
        centroids = [by_cell.get(i, centroids[i]) for i in range(_KMEANS_K)]
    return assigned


@query("emb_kmeans_lloyd")  # rows-only: iterative fixpoint, no ANSI-SQL twin
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus, k=8, 3 iterations,
    deterministic init (the k smallest vec_ids). Each iteration:
    centroids (k×64 doubles) BROADCAST as a literal array-of-arrays →
    in-row argmin assignment (the sim_ann_ivf expression shape, zero
    shuffle) → one cell-keyed average (posexplode + (cell,dim) agg).
    Driver transfer per iteration is k×d doubles — bounded like
    emb_pca_power's Gram rows, never corpus-sized. At 100 TB: identical
    plan; iterations are the only sequential dimension. Output: per
    cell, member count and mean within-cell cosine-free L2 inertia.
    Rows-only lane; values pinned in pytest on planted clusters."""
    assigned = kmeans_assigned(spark, sf_dir)
    return (
        assigned.groupBy("cell")
        .agg(
            bi(F.count(F.lit(1))).alias("n_vectors"),
            r6(F.avg("d2")).alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )


@query(
    "corpus_filter_verdicts",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(list_filter(string_split(text, ' '), x -> x != '')) AS n_words,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
    ), rules AS (
      SELECT doc_id,
             (n_chars BETWEEN 50 AND 20000)                         AS ok_len,
             (n_words > 0 AND
              CAST(n_chars AS DOUBLE) / n_words BETWEEN 2.0 AND 15.0) AS ok_wordlen,
             (CAST(n_digits AS DOUBLE) / n_chars <= 0.3)            AS ok_digits,
             (CAST(n_upper AS DOUBLE) / n_chars <= 0.3)             AS ok_upper
      FROM feats
    )
    SELECT doc_id, ok_len, ok_wordlen, ok_digits, ok_upper,
           (ok_len AND ok_wordlen AND ok_digits AND ok_upper) AS keep,
           concat_ws('|',
             CASE WHEN NOT ok_len     THEN 'len'     END,
             CASE WHEN NOT ok_wordlen THEN 'wordlen' END,
             CASE WHEN NOT ok_digits  THEN 'digits'  END,
             CASE WHEN NOT ok_upper   THEN 'upper'   END) AS drop_reasons
    FROM rules
    """,
)
def corpus_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus quality gate: four deterministic rules
    (character-length band, mean-word-length band, digit-ratio cap,
    uppercase-ratio cap) evaluated in ONE projection — no shuffle at
    all — emitting per-rule flags, the conjunction verdict, and a
    pipe-joined drop-reason string (the audit trail a filtering run
    must keep). Gopher-style repetition and language confidence gates
    live in their own ops (text_repetition_gopher, text_lang_id); this
    is the cheap always-on front gate."""
    d = t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    n_digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_upper = F.length(F.regexp_replace("text", "[^A-Z]", ""))
    feats = d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_digits.alias("n_digits"),
        n_upper.alias("n_upper"),
    )
    ok_len = F.col("n_chars").between(50, 20000)
    ok_wordlen = (F.col("n_words") > 0) & (
        (F.col("n_chars").cast("double") / F.col("n_words")).between(2.0, 15.0)
    )
    ok_digits = F.col("n_digits").cast("double") / F.col("n_chars") <= 0.3
    ok_upper = F.col("n_upper").cast("double") / F.col("n_chars") <= 0.3
    rules = feats.select(
        "doc_id",
        ok_len.alias("ok_len"),
        ok_wordlen.alias("ok_wordlen"),
        ok_digits.alias("ok_digits"),
        ok_upper.alias("ok_upper"),
    )
    return rules.select(
        "doc_id",
        "ok_len",
        "ok_wordlen",
        "ok_digits",
        "ok_upper",
        (F.col("ok_len") & F.col("ok_wordlen") & F.col("ok_digits") & F.col("ok_upper")).alias(
            "keep"
        ),
        F.concat_ws(
            "|",
            F.when(~F.col("ok_len"), "len"),
            F.when(~F.col("ok_wordlen"), "wordlen"),
            F.when(~F.col("ok_digits"), "digits"),
            F.when(~F.col("ok_upper"), "upper"),
        ).alias("drop_reasons"),
    )


@query(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\b\\w*ing\\b')) AS BIGINT)
             AS n_matches,
           CASE WHEN len(regexp_extract_all(text, '\\b\\w*ing\\b')) > 0
                THEN regexp_extract_all(text, '\\b\\w*ing\\b')[1] END
             AS first_match,
           coalesce(array_to_string(list_sort(list_distinct(
             regexp_extract_all(text, '\\b\\w*ing\\b')))[1:3], ','), '')
             AS distinct_head
    FROM documents
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — the extract-EVERY-match surface (array
    result) vs regexp_extract's first-match: match count, first match,
    and the first 3 sorted-distinct matches joined. RE2-safe pattern
    subset (\\b and \\w agree between Java regex and RE2 for ASCII);
    per-row projection, whole-stage codegen, zero shuffle."""
    d = t(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit(r"\b\w*ing\b"), 0)
    return d.select(
        "doc_id",
        bi(F.size(matches)).alias("n_matches"),
        F.when(F.size(matches) > 0, F.element_at(matches, 1)).alias("first_match"),
        F.concat_ws(
            ",", F.slice(F.array_sort(F.array_distinct(matches)), 1, 3)
        ).alias("distinct_head"),
    )


@query(
    "ml_target_encoding",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_discount,
             sum(l_discount) OVER (PARTITION BY l_suppkey) AS s,
             count(*)        OVER (PARTITION BY l_suppkey) AS n
      FROM lineitem
    ),
    prior AS (SELECT avg(l_discount) AS p FROM lineitem)
    SELECT l_orderkey, l_linenumber, l_suppkey,
      CASE WHEN n > 1 THEN round((s - l_discount) / (n - 1), 6) END AS loo_enc,
      round((s - l_discount + 10 * (SELECT p FROM prior)) / (n - 1 + 10), 6) AS loo_enc_smoothed
    FROM g
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature (supplier),
    target = discount: each row's encoding is its group mean EXCLUDING
    the row itself — the standard leakage-safe mean encoding — plus the
    m-estimate smoothed variant (m = 10 pseudo-observations of the
    global prior) that keeps rare categories from memorizing their few
    targets. One supplier-keyed window pass computes (group sum, group
    count); the per-row exclusion is then arithmetic — no per-row
    re-aggregation, no self-join, which is what makes LOO encoding
    linear at any scale. The global prior is a 1-row broadcast.
    Singleton groups yield NULL unsmoothed (no other rows to average)
    and fall back to pure prior territory in the smoothed column."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey")
    prior = li.agg(F.avg("l_discount").alias("p"))
    g = li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_discount",
        F.sum("l_discount").over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return g.crossJoin(F.broadcast(prior)).select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.when(
            F.col("n") > 1, r6((F.col("s") - F.col("l_discount")) / (F.col("n") - 1))
        ).alias("loo_enc"),
        r6(
            (F.col("s") - F.col("l_discount") + 10 * F.col("p"))
            / (F.col("n") - 1 + 10)
        ).alias("loo_enc_smoothed"),
    )


_PQ_M = 8   # subspaces
_PQ_D = 8   # dims per subspace (M*D = 64, the corpus width)
_PQ_K = 16  # codes per subspace -> 4 bits; 8 subspaces = 8 bytes/vector


def _pq_sub_split(emb):
    """(vec_id, sub, sv) grain: one in-row explode, no shuffle."""
    return emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                lambda m: F.slice("e", m * _PQ_D + 1, _PQ_D),
            )
        ).alias("sub", "sv"),
    )


def _pq_codebook_lit(codebooks):
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cb])
            for cb in codebooks
        ]
    )


def _pq_encode(sub, codebooks):
    """In-row nearest-code assignment under the given codebooks (one
    ~4 KB literal broadcast; zero shuffle)."""
    dists = F.transform(
        F.element_at(_pq_codebook_lit(codebooks), F.col("sub") + 1),
        lambda c: F.aggregate(
            F.zip_with(F.col("sv"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return sub.withColumn("ds", dists).select(
        "vec_id",
        "sub",
        "sv",
        (F.array_position(F.col("ds"), F.array_min("ds")) - 1)
        .cast("int")
        .alias("code"),
        F.array_min("ds").alias("d2"),
    )


def pq_train(emb, iters: int = 2):
    """Per-subspace k-means codebook learning (deterministic smallest-
    vec_id init). Returns (codebooks, coded_last) — coded_last is the
    assignment under the PRE-final-update books (the historical
    emb_pq_quantize readout); encode with the RETURNED books for ADC."""
    sub = _pq_sub_split(emb)
    seed = emb.orderBy("vec_id").limit(_PQ_K).collect()
    codebooks = [
        [row["e"][m * _PQ_D : (m + 1) * _PQ_D] for row in seed] for m in range(_PQ_M)
    ]
    coded = None
    for _ in range(iters):
        coded = _pq_encode(sub, codebooks)
        upd = (
            coded.select("sub", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("sm"))
            .select("sub", "code", F.transform("sm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        by_key = {(r["sub"], r["code"]): r["c"] for r in upd}
        codebooks = [
            [by_key.get((m, j), codebooks[m][j]) for j in range(_PQ_K)]
            for m in range(_PQ_M)
        ]
    return codebooks, coded



@query("emb_pq_quantize")  # rows-only: iterative codebook learning (k-means per subspace)
def emb_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the memory backbone of billion-scale ANN
    (IVF-PQ): the 64-d vector splits into 8 subvectors of 8 dims; each
    subspace learns a 16-centroid codebook (2 Lloyd iterations,
    deterministic smallest-vec_id init), and every vector encodes as 8
    4-bit codes — 256-byte float vectors become 8 bytes (32× compression,
    ADC distance tables at query time). Structure: ONE in-row explode to
    (vec, subspace, subvec) grain, then k-means exactly as
    emb_kmeans_lloyd but with the codebook axis indexed by subspace —
    per iteration ONE broadcast of all 8×16×8 centroid floats (a literal,
    ~4 KB), in-row argmin (zero shuffle), one (subspace, code, dim)-keyed
    average whose result is the only driver transfer (1024 doubles/iter,
    corpus never leaves executors). Output: per-subspace member counts,
    mean within-code squared error (the PQ distortion that ADC recall
    tracks), and live-code counts. Rows-only lane (iterative); exactness
    pinned in tests/test_iterative_pins.py on a planted ≤16-patterns-per-
    subspace corpus that PQ must encode losslessly. Training loop shared
    with sim_ann_ivfpq via pq_train/_pq_encode."""
    emb = (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        .cache()
    )
    _, coded = pq_train(emb, iters=2)
    return (
        coded.groupBy("sub")
        .agg(
            bi(F.count(F.lit(1))).alias("n_subvectors"),
            r6(F.avg("d2")).alias("mean_sq_err"),
            bi(F.countDistinct("code")).alias("n_codes_used"),
        )
        .orderBy("sub")
        .select(bi(F.col("sub")).alias("subspace"), "n_subvectors", "mean_sq_err", "n_codes_used")
    )


