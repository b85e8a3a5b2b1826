"""§2 round-3 addendum Y — scalable quantile banding, array set algebra,
inline VALUES tables, and the mergeable set-similarity sketch.

- agg_percentile_bands — the quartile pattern that SCALES: exact
  p25/p50/p75 thresholds from ONE global aggregate (3 scalars,
  broadcast), then a per-row band assignment + band rollup. This is the
  documented 100 TB swap for ntile-style global windows (SCALE.md §E/F):
  threshold discovery is an aggregate, not a sort.
- fn_array_set_ops — array_union / array_intersect / array_except (+
  Jaccard) over per-document token-set halves; pure in-row algebra.
- sql_inline_values — the VALUES inline-table surface: a literal
  weight table declared in SQL, broadcast-joined to a fact rollup —
  the migrated-SQL idiom for small reference data that lives in the
  query text.
- agg_minhash_group_jaccard — mergeable MinHash at GROUP grain: 64
  per-permutation MIN aggregates per (lang, source) shard, persisted,
  then merged across shards by elementwise MIN (min is associative —
  the merge is EXACT, pinned by a merged==oneshot flag in the output),
  and pairwise language token-set similarity estimated from signature
  agreement next to the exact Jaccard for calibration. Rows-only lane
  (xxhash64 signatures); completes the mergeable-sketch family
  (HLL ∪ quantile ∪ bitmap ∪ count-min ∪ set-similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t, register_views
from ..functions.parity import bi, r6
from ..registry import query
from .sources import _scratch
from .text import _MINHASH_P, _minhash_coeffs


@query(
    "agg_percentile_bands",
    oracle="""
    WITH th AS (
      SELECT CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS p25,
             CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE) AS p50,
             CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS p75
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= p25 THEN 'Q1'
                WHEN o_totalprice <= p50 THEN 'Q2'
                WHEN o_totalprice <= p75 THEN 'Q3'
                ELSE 'Q4' END            AS band,
           CAST(count(*) AS BIGINT)      AS n_orders,
           round(min(o_totalprice), 2)   AS lo,
           round(max(o_totalprice), 2)   AS hi
    FROM orders, th
    GROUP BY 1
    """,
)
def agg_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile banding via exact percentile THRESHOLDS (one global
    aggregate producing 3 scalars, broadcast) instead of an ntile
    window: the price-band sizes are near-equal by construction, but no
    row ever passes through a rank — threshold discovery is a two-phase
    aggregate, assignment is a projection, and the pattern survives any
    scale (swap `percentile` for `approx_percentile` when exactness is
    negotiable). This is the executable form of the quartile swap
    SCALE.md §E/F names for global ntile windows."""
    o = t(spark, sf_dir, "orders")
    th = o.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
    )
    band = (
        F.when(F.col("o_totalprice") <= F.col("p25"), "Q1")
        .when(F.col("o_totalprice") <= F.col("p50"), "Q2")
        .when(F.col("o_totalprice") <= F.col("p75"), "Q3")
        .otherwise("Q4")
    )
    return (
        o.crossJoin(F.broadcast(th))
        .groupBy(band.alias("band"))
        .agg(
            bi(F.count(F.lit(1))).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "fn_array_set_ops",
    oracle="""
    WITH halves AS (
      SELECT doc_id,
             list_distinct(l[1:len(l)//2])          AS a,
             list_distinct(l[len(l)//2+1:len(l)])   AS b
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS l
            FROM documents)
    )
    SELECT doc_id,
           CAST(len(list_distinct(a || b)) AS BIGINT)   AS n_union,
           CAST(len(list_filter(a, x -> list_contains(b, x))) AS BIGINT)
             AS n_intersect,
           CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS BIGINT)
             AS n_except,
           round(CAST(len(list_filter(a, x -> list_contains(b, x))) AS DOUBLE)
                 / nullif(len(list_distinct(a || b)), 0), 6) AS jaccard
    FROM halves
    """,
)
def fn_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union / array_intersect / array_except + Jaccard between
    the distinct token sets of each document's two halves — the in-row
    set-algebra surface (sizes only, so the engines' differing element
    orders never matter). Pure projection, whole-stage codegen."""
    d = t(spark, sf_dir, "documents")
    l = F.filter(F.split("text", " "), lambda x: x != "")
    half = F.floor(F.size(l) / 2).cast("int")
    withs = d.select(
        "doc_id",
        F.array_distinct(F.slice(l, 1, half)).alias("a"),
        F.array_distinct(
            F.slice(l, half + 1, F.size(l) - half)
        ).alias("b"),
    )
    n_union = F.size(F.array_union("a", "b"))
    n_intersect = F.size(F.array_intersect("a", "b"))
    n_except = F.size(F.array_except("a", "b"))
    return withs.select(
        "doc_id",
        bi(n_union).alias("n_union"),
        bi(n_intersect).alias("n_intersect"),
        bi(n_except).alias("n_except"),
        r6(
            n_intersect.cast("double") / F.nullif(n_union, F.lit(0))
        ).alias("jaccard"),
    )


@query(
    "sql_inline_values",
    oracle="""
    WITH w(o_orderpriority, wt) AS (
      VALUES ('1-URGENT', 3.0), ('2-HIGH', 2.0), ('3-MEDIUM', 1.5),
             ('4-NOT SPECIFIED', 1.0), ('5-LOW', 0.5)
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT)                    AS n_orders,
           round(sum(o.o_totalprice * w.wt), 2)        AS weighted_revenue
    FROM orders o JOIN w USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def sql_inline_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUES inline-table surface: a 5-row literal weight table
    declared inside the SQL text, joined (broadcast — it is literal
    rows) to the orders rollup. The migrated-SQL idiom for small
    reference data; the optimizer folds the VALUES relation to a
    LocalRelation, so no scan or shuffle exists for it."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH w(o_orderpriority, wt) AS (
          VALUES ('1-URGENT', 3.0D), ('2-HIGH', 2.0D), ('3-MEDIUM', 1.5D),
                 ('4-NOT SPECIFIED', 1.0D), ('5-LOW', 0.5D)
        )
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT)             AS n_orders,
               round(sum(o.o_totalprice * w.wt), 2) AS weighted_revenue
        FROM orders o JOIN w USING (o_orderpriority)
        GROUP BY o.o_orderpriority
        """
    )


@query("agg_minhash_group_jaccard")  # rows-only: xxhash64 signatures
def agg_minhash_group_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable MinHash at GROUP grain — the set-similarity member of
    the mergeable-sketch family. Per (lang, source) shard, the 64
    permutation minima of the shard's distinct-token hashes are 64
    plain MIN aggregates (algebraic, partial+final); the shard sketches
    are PERSISTED to parquet and merged across sources by elementwise
    MIN — min is associative, so the merged per-lang signature is
    EXACTLY the one-shot per-lang signature (pinned by the
    merge_exact flag, true for every row). Pairwise language similarity
    is then estimated from signature slot agreement next to the exact
    token Jaccard for calibration (E[match-rate] = J, σ ≈ 0.06 at 64
    perms). At 100 TB: shard sketches are what you store per
    day/partition; any group-pair similarity question is answered from
    kilobyte signatures with no raw re-scan."""
    docs = t(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "lang", "source", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    h = F.pmod(F.xxhash64("term"), F.lit(_MINHASH_P))
    coeffs = _minhash_coeffs()
    mins = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MINHASH_P))).alias(f"m_{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    shard = tok.groupBy("lang", "source").agg(*mins)
    path = _scratch(sf_dir, "minhash_group_sketches")
    shard.write.mode("overwrite").parquet(path)
    merged = (
        spark.read.parquet(path)
        .groupBy("lang")
        .agg(*[F.min(f"m_{i}").alias(f"m_{i}") for i in range(len(coeffs))])
    )
    oneshot = tok.select("lang", "term").distinct().groupBy("lang").agg(
        *[
            F.min(
                F.pmod(
                    F.pmod(F.xxhash64("term"), F.lit(_MINHASH_P)) * F.lit(a)
                    + F.lit(b),
                    F.lit(_MINHASH_P),
                )
            ).alias(f"o_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    sig = merged.join(oneshot, "lang").select(
        "lang",
        F.array(*[F.col(f"m_{i}") for i in range(len(coeffs))]).alias("sig"),
        F.array(*[F.col(f"o_{i}") for i in range(len(coeffs))]).alias("osig"),
    )
    a = sig.select(
        F.col("lang").alias("lang_a"),
        F.col("sig").alias("sig_a"),
        F.col("osig").alias("osig_a"),
    )
    b = sig.select(
        F.col("lang").alias("lang_b"),
        F.col("sig").alias("sig_b"),
        F.col("osig").alias("osig_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("lang_a") < F.col("lang_b"))
    n_match = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    est = r6(n_match.cast("double") / float(len(coeffs)))
    merge_exact = (F.col("sig_a") == F.col("osig_a")) & (
        F.col("sig_b") == F.col("osig_b")
    )
    toks_l = tok.select("lang", "term").distinct()
    ta = toks_l.select(F.col("lang").alias("lang_a"), "term")
    tb = toks_l.select(F.col("lang").alias("lang_b"), "term")
    inter = (
        ta.join(tb, "term")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = toks_l.groupBy("lang").agg(F.count(F.lit(1)).alias("n_terms"))
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("n_terms").alias("na"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("n_terms").alias("nb"))
    exact = (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            r6(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("exact_jaccard"),
        )
    )
    return (
        pairs.select("lang_a", "lang_b", est.alias("est_jaccard"), merge_exact.alias("merge_exact"))
        .join(exact, ["lang_a", "lang_b"])
        .select(
            "lang_a",
            "lang_b",
            "est_jaccard",
            "exact_jaccard",
            r6(F.abs(F.col("est_jaccard") - F.col("exact_jaccard"))).alias("abs_err"),
            "merge_exact",
        )
    )
