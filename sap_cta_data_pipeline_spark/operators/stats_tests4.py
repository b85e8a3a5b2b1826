"""§2 round-9 batch FA — partial autocorrelation (Durbin–Levinson),
the Friedman rank test, and cryptographic content digests.

- ``ts_pacf_durbin_levinson``: PACF φ_kk for lags 1..4 by unrolling the
  Durbin–Levinson recursion SYMBOLICALLY over the exact-integer ACF
  machinery (batch EW's identity): the recursion's expression strings
  are built ONCE in Python and fed verbatim to BOTH engines
  (F.expr / oracle SQL), so the double arithmetic is structurally
  identical by construction — the strongest form of the house parity
  discipline.
- ``stats_friedman_test``: the nonparametric repeated-measures ANOVA:
  users are blocks, event types are treatments, within-block midranks of
  activity, Q = 12n/(k(k+1))·Σ(R̄_j − (k+1)/2)². Midranks are exact
  halves (rank + (ties−1)/2), so every sum is exact in both engines.
- ``fn_hash_digests``: md5 + sha256 content fingerprints — the
  cross-system dedup/lineage id surface (both engines ship the same
  published digests, so the oracle certifies bytes-level agreement).

Scale notes (SCALE.md batch FA): PACF adds a 4-row pivot on top of the
Ljung–Box envelope (one day rollup + a days×4 index join); Friedman is
one (user,type) aggregation, per-user k-row rank windows (PARTITIONED —
fact-grain parallel), and a k-row final; digests are a pure codegen'd
map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .timeseries4 import _DAILY_SQL, _daily_idx

_P_LAGS = 4


def _pacf_exprs() -> list[tuple[str, str]]:
    """Unrolled Durbin–Levinson: returns [(lag_k, expression over
    rho1..rho4)] as SQL strings shared verbatim by both engines."""
    phi: dict[tuple[int, int], str] = {(1, 1): "rho1"}
    out = [("1", "rho1")]
    for k in range(2, _P_LAGS + 1):
        num = f"rho{k} - (" + " + ".join(
            f"({phi[(k - 1, j)]}) * rho{k - j}" for j in range(1, k)
        ) + ")"
        den = "1 - (" + " + ".join(
            f"({phi[(k - 1, j)]}) * rho{j}" for j in range(1, k)
        ) + ")"
        phi[(k, k)] = f"(({num}) / ({den}))"
        for j in range(1, k):
            phi[(k, j)] = f"(({phi[(k - 1, j)]}) - {phi[(k, k)]} * ({phi[(k - 1, k - j)]}))"
        out.append((str(k), phi[(k, k)]))
    return out


_ACF_PIVOT_SQL = f"""
    idx AS ({_DAILY_SQL}),
    tot AS (SELECT count(*) AS n, sum(c) AS s, sum(c * c) AS q FROM idx),
    lags AS (SELECT k FROM (VALUES (1),(2),(3),(4)) t(k)),
    pair AS (
      SELECT lags.k, sum(a.c * b.c) AS p, sum(a.c) AS h, sum(b.c) AS tl
      FROM lags JOIN idx a ON true JOIN idx b ON b.i = a.i + lags.k
      GROUP BY lags.k
    ),
    acf AS (
      SELECT k,
             (CAST(p AS DOUBLE)
              - (CAST(s AS DOUBLE) / n) * (CAST(h AS DOUBLE) + CAST(tl AS DOUBLE))
              + (n - k) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               AS rho
      FROM pair, tot
    ),
    piv AS (
      SELECT max(CASE WHEN k = 1 THEN rho END) AS rho1,
             max(CASE WHEN k = 2 THEN rho END) AS rho2,
             max(CASE WHEN k = 3 THEN rho END) AS rho3,
             max(CASE WHEN k = 4 THEN rho END) AS rho4
      FROM acf
    )
"""


def _pacf_oracle() -> str:
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS lag, round({expr}, 6) AS pacf FROM piv"
        for k, expr in _pacf_exprs()
    ]
    return "WITH " + _ACF_PIVOT_SQL + "\n" + "\nUNION ALL\n".join(selects)


@query("ts_pacf_durbin_levinson", oracle=_pacf_oracle())
def ts_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily series for lags 1..4 via the
    Durbin–Levinson recursion — the AR-order diagnostic (an AR(p) series
    has PACF ≈ 0 beyond lag p) paired with batch EW's Ljung–Box. The
    ACF feeding it uses the exact-integer identity; the recursion is
    unrolled into expression strings evaluated VERBATIM by both engines,
    so parity is structural, not coincidental. Reference-formula pin
    (statsmodels-equivalent recursion in pure python) in tests.

    Scale: the Ljung–Box envelope (one day rollup, days×4 index join)
    plus a 1-row pivot and four scalar expressions."""
    idx = _daily_idx(spark, sf_dir)
    tot = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    lags = spark.range(1, _P_LAGS + 1).select(F.col("id").cast("int").alias("k"))
    a = idx.select(F.col("i").alias("ai"), F.col("c").alias("ac"))
    b = idx.select(F.col("i").alias("bi_"), F.col("c").alias("bc"))
    pair = (
        lags.crossJoin(a)
        .join(b, F.col("bi_") == F.col("ai") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("ac") * F.col("bc")).alias("p"),
            F.sum("ac").alias("h"),
            F.sum("bc").alias("tl"),
        )
    )
    nd = F.col("n")
    mean = F.col("s").cast("double") / nd
    rho = (
        F.col("p").cast("double")
        - mean * (F.col("h").cast("double") + F.col("tl").cast("double"))
        + (nd - F.col("k")) * mean * mean
    ) / (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    )
    acf = pair.crossJoin(F.broadcast(tot)).select("k", rho.alias("rho"))
    piv = acf.agg(
        *[
            F.max(F.when(F.col("k") == i, F.col("rho"))).alias(f"rho{i}")
            for i in range(1, _P_LAGS + 1)
        ]
    )
    pieces = [
        piv.select(
            F.lit(int(k)).cast("long").alias("lag"),
            r6(F.expr(expr)).alias("pacf"),
        )
        for k, expr in _pacf_exprs()
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionAll(p)
    return out


@query(
    "stats_friedman_test",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ), k AS (SELECT count(DISTINCT event_type) AS k FROM ut),
    full_users AS (
      SELECT user_id FROM ut, k GROUP BY user_id, k.k
      HAVING count(*) = any_value(k.k)
    ), ranked AS (
      SELECT ut.user_id, ut.event_type,
             rank() OVER (PARTITION BY ut.user_id ORDER BY ut.c)
               + (count(*) OVER (PARTITION BY ut.user_id, ut.c) - 1) / 2.0
               AS midrank
      FROM ut JOIN full_users USING (user_id)
    ), pertype AS (
      SELECT event_type, count(*) AS n_blocks, sum(midrank) AS rank_sum
      FROM ranked GROUP BY event_type
    ), kk AS (SELECT count(*) AS k FROM pertype),
    fin AS (
      SELECT kk.k AS k, any_value(n_blocks) AS n,
             sum((CAST(rank_sum AS DOUBLE) / n_blocks - (kk.k + 1) / 2.0)
                 * (CAST(rank_sum AS DOUBLE) / n_blocks - (kk.k + 1) / 2.0))
               AS ss
      FROM pertype, kk GROUP BY kk.k
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n_blocks,
           round(12.0 * n / (k * (k + 1)) * ss, 6) AS q_stat
    FROM fin
    """,
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — 'do users rank the event types consistently
    differently?': blocks = users observed in ALL k event types (the
    balanced design the test requires), within-block midranks of
    activity counts (ties get exact-half averaged ranks), Q =
    12n/(k(k+1))·Σ_j (R̄_j − (k+1)/2)². The nonparametric
    repeated-measures companion to stats_anova_oneway — no normality
    assumption, per-user scale differences cancel by ranking. Midranks
    are exact halves, so every cross-engine sum is exact.

    Scale: one (user,type) aggregation (the corpus shuffle), per-user
    k-row rank windows at full parallelism (PARTITIONED by user — never
    global), a k-row final."""
    e = t(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    kdf = ut.agg(F.countDistinct("event_type").alias("k"))
    full_users = (
        ut.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .crossJoin(F.broadcast(kdf))
        .filter(F.col("nt") == F.col("k"))
        .select("user_id")
    )
    wrank = Window.partitionBy("user_id").orderBy("c")
    wtie = Window.partitionBy("user_id", "c")
    ranked = ut.join(full_users, "user_id").select(
        "user_id",
        "event_type",
        (
            F.rank().over(wrank)
            + (F.count(F.lit(1)).over(wtie) - 1) / F.lit(2.0)
        ).alias("midrank"),
    )
    pertype = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("midrank").alias("rank_sum"),
    )
    kk = pertype.agg(F.count(F.lit(1)).alias("k"))
    dev = (
        F.col("rank_sum").cast("double") / F.col("n_blocks")
        - (F.col("k") + 1) / F.lit(2.0)
    )
    fin = (
        pertype.crossJoin(F.broadcast(kk))
        .select("k", "n_blocks", (dev * dev).alias("d2"))
        .groupBy("k")
        .agg(
            F.any_value(F.col("n_blocks")).alias("n"),
            F.sum("d2").alias("ss"),
        )
    )
    return fin.select(
        bi(F.col("k")).alias("k"),
        bi(F.col("n")).alias("n_blocks"),
        r6(
            F.lit(12.0)
            * F.col("n")
            / (F.col("k") * (F.col("k") + 1))
            * F.col("ss")
        ).alias("q_stat"),
    )


@query(
    "fn_hash_digests",
    oracle="""
    SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
    FROM documents WHERE doc_id % 11 = 0
    """,
)
def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content digests (md5 + sha256 hex) — the
    cross-system fingerprint surface: dedup ledgers, lineage ids, and
    content-addressed storage all key on these, and the oracle certifies
    both engines produce the PUBLISHED digests byte-for-byte (any
    encoding drift — normalization, charset — breaks the hash here
    first, before it corrupts a production ledger).

    Scale: pure codegen'd map pass; digests are the textbook
    embarrassingly-parallel transform."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )
