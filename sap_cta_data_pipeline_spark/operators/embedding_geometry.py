"""§2 round-7 batch CR — embedding-geometry diagnostics.

Three collapse/anisotropy diagnostics an embedding pipeline runs before
trusting ANN or semantic-dedup results (rounds 1-6 built the indexes;
this batch profiles the space they index):

- ISOTROPY: how far the cloud sits from the origin relative to its
  spread — mean cosine to the centroid near 1 means a collapsed,
  anisotropic space where cosine stops discriminating (the common
  failure of contrastive embeddings),
- a deterministic PAIRWISE-cosine sample histogram — the actual
  similarity distribution ANN thresholds are read from,
- per-DIMENSION variance top-k — 'rogue dimensions' that dominate
  distances and should be clipped/whitened.

Scale notes: isotropy and dim-variance are posexplode → (pos)-keyed
aggs (64 reduce keys regardless of corpus); the pairwise sample uses an
id-arithmetic predicate (deterministic, engine-independent — NO rand())
whose modulus scales the pair count, and the pair join is a theta join
ON the sampled ids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "emb_isotropy_score",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c AS (
      SELECT i AS pos, avg(v[i + 1]) AS cv
      FROM e, range(0, 64) t(i) GROUP BY 1
    ),
    per AS (
      SELECT e.vec_id,
             list_sum(list_transform(range(1, 65), i -> e.v[i] * e.v[i])) AS vv,
             sum(e.v[c.pos + 1] * c.cv) AS vc
      FROM e, c
      GROUP BY e.vec_id, e.v
    ),
    cn AS (SELECT sqrt(sum(cv * cv)) AS cnorm FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(cn.cnorm, 6) AS centroid_norm,
           round(avg(sqrt(vv)), 6) AS mean_vec_norm,
           round(avg(vc / (sqrt(vv) * cn.cnorm)), 6) AS mean_cos_to_centroid
    FROM per, cn
    GROUP BY cn.cnorm
    """,
)
def emb_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy profile: centroid norm vs mean vector norm, and the
    mean cosine of every vector to the centroid. A healthy (isotropic)
    space has centroid_norm ≪ mean_vec_norm and mean cosine near 0; a
    collapsed space has mean cosine near 1 and cosine similarity stops
    discriminating — the first thing to check when ANN recall looks too
    good. Centroid is a 64-row agg broadcast back by position; the
    per-vector dot products are (pos)-keyed arithmetic after one
    posexplode — no vector ever crosses the wire twice."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    c = ex.groupBy("pos").agg(F.avg("val").alias("cv"))
    per = (
        ex.join(F.broadcast(c), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("val") * F.col("val")).alias("vv"),
            F.sum(F.col("val") * F.col("cv")).alias("vc"),
        )
    )
    cn = c.agg(F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm"))
    return (
        per.crossJoin(F.broadcast(cn))
        .groupBy("cnorm")
        .agg(
            bi(F.count(F.lit(1))).alias("n_vectors"),
            r6(F.avg(F.sqrt("vv"))).alias("mean_vec_norm"),
            r6(
                F.avg(F.col("vc") / (F.sqrt("vv") * F.col("cnorm")))
            ).alias("mean_cos_to_centroid"),
        )
        .select(
            "n_vectors",
            r6(F.col("cnorm")).alias("centroid_norm"),
            "mean_vec_norm",
            "mean_cos_to_centroid",
        )
    )


@query(
    "emb_pairwise_cosine_sample",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e
    ),
    pr AS (
      SELECT list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
               / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b
        ON a.vec_id < b.vec_id
       AND (a.vec_id * 31 + b.vec_id) % 199 = 0
    )
    SELECT CAST(floor(cos * 10) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(cos), 6) AS mean_cos
    FROM pr GROUP BY 1
    """,
)
def emb_pairwise_cosine_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairwise-cosine distribution, decile-binned, over a
    DETERMINISTIC id-arithmetic sample ((a·31 + b) mod 199 = 0, a < b) —
    no rand(), so both engines sample the identical pair set and the
    histogram is reproducible run-to-run (the property a tuning
    artifact must have). This is the distribution ANN/dedup thresholds
    are read from: a right-shifted histogram means a hot (collapsed)
    space where a 0.8 threshold over-merges. The modulus scales the
    sampled-pair count (~n²/199 here; at corpus scale set it near n so
    the sample stays ~n pairs); cosines fold IN-ROW via zip_with —
    vectors cross the wire once into the join.

    Plan shape (the 100-TB part): the raw predicate
    ``(ia*31 + ib) % 199 = 0`` is non-equi, so expressed directly Spark
    plans a BroadcastNestedLoopJoin — it broadcasts one WHOLE corpus side
    and evaluates O(n²) predicates regardless of the modulus (the modulus
    tunes OUTPUT size, not comparison count). But the predicate is a
    residue-class equality: (ia·31 + ib) ≡ 0 (mod 199) ⟺
    ib mod 199 = (−31·ia) mod 199. Deriving ``a_key = (199 − (ia·31) %
    199) % 199`` and ``b_key = ib % 199`` turns it into an equi-join
    (hash join, work bounded by matching residue classes ≈ n²/199 output
    pairs) with ``ia < ib`` as the residual — same pair set, same oracle,
    no BNLJ. test_plans.py pins the executed plan BNLJ-free."""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    n = e.select(
        "vec_id",
        v.alias("v"),
    ).select(
        "vec_id",
        "v",
        F.sqrt(
            F.aggregate(
                F.zip_with("v", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        # residue class this row's partners must live in:
        # (ia*31 + ib) % 199 == 0  ⟺  ib % 199 == (199 - (ia*31) % 199) % 199
        ((F.lit(199) - (F.col("vec_id") * 31) % 199) % 199).alias("rkey"),
    )
    b = n.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        (F.col("vec_id") % 199).alias("rkey"),
    )
    pairs = a.join(b, "rkey").where(F.col("ia") < F.col("ib"))
    cos = (
        F.aggregate(
            F.zip_with("va", "vb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("na") * F.col("nb"))
    )
    return (
        pairs.select(cos.alias("cos"))
        .groupBy(bi(F.floor(F.col("cos") * 10)).alias("bin"))
        .agg(
            bi(F.count(F.lit(1))).alias("n_pairs"),
            r6(F.avg("cos")).alias("mean_cos"),
        )
    )


@query(
    "emb_dim_variance_topk",
    oracle="""
    WITH x AS (
      SELECT i AS pos, var_samp(CAST(embedding[i + 1] AS DOUBLE)) AS dim_var,
             avg(CAST(embedding[i + 1] AS DOUBLE)) AS dim_mean
      FROM embeddings, range(0, 64) t(i)
      GROUP BY 1
    )
    SELECT CAST(pos AS BIGINT) AS pos,
           round(dim_var, 6) AS dim_var,
           round(dim_mean, 6) AS dim_mean
    FROM x ORDER BY dim_var DESC, pos LIMIT 10
    """,
)
def emb_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 'rogue dimensions' by variance (with their means):
    dimensions whose variance dwarfs the rest dominate every distance
    and cosine — the standard prescription is to clip or whiten them
    before indexing (the diagnostic half of emb_pca_power /
    emb_covariance_block). posexplode → 64-key agg → top-10 with a
    deterministic pos tiebreak: reduce side is 64 rows at any corpus
    size."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "val")).withColumn(
        "val", F.col("val").cast("double")
    )
    x = ex.groupBy("pos").agg(
        F.var_samp("val").alias("dim_var"), F.avg("val").alias("dim_mean")
    )
    return (
        x.orderBy(F.col("dim_var").desc(), "pos")
        .limit(10)
        .select(
            bi(F.col("pos")).alias("pos"),
            r6(F.col("dim_var")).alias("dim_var"),
            r6(F.col("dim_mean")).alias("dim_mean"),
        )
    )
