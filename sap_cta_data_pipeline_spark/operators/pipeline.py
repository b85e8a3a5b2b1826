"""§2-M Reference-pipeline analogues (SURVEY.md §0.1, §2-M).

The reference `jdhp-sap/sap-cta-data-pipeline` is a batch image-cleaning /
feature-extraction / benchmarking pipeline for CTA telescope images
(reconstruction in SURVEY.md §0.1 — its snapshot at /root/reference was
empty, so no file:line citations are possible). Its core loop — clean each
image with two-threshold ("tailcut") filtering, remove isolated pixels,
extract Hillas-style moment features, score cleaned vs raw, sweep cleaning
hyperparameters — is reproduced here 1:1 on the 1-D `embeddings` vectors
(the corpus stand-in for images).

Execution shape: every op explodes vectors to long-format cells
(vec, pos, value, neighbors) and reduces with hash aggregations — per-image
work the reference did in numpy one image at a time becomes one
distributed pass; a hyperparameter sweep that re-ran the corpus per config
becomes a single broadcast cross-join (configs × cells). No Python UDFs.

Thresholds are sized to the data (values ≈ N(0, 0.125), FIXTURES.md):
T_pic=0.2 keeps ≈5% of cells, T_bnd=0.1 ≈ 21%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: DuckDB fragment producing the long-format cell table (0-based pos, cell
#: value x, zero-padded neighbors) — list index OOB yields NULL → coalesce.
_CELLS_SQL = """
  SELECT vec_id, label, i AS pos,
         CAST(embedding[i + 1] AS DOUBLE)                 AS x,
         coalesce(CAST(embedding[i] AS DOUBLE), 0.0)      AS left_x,
         coalesce(CAST(embedding[i + 2] AS DOUBLE), 0.0)  AS right_x
  FROM embeddings, range(0, 64) t(i)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format cells: (vec_id, label, pos, x, left_x, right_x) with
    out-of-range neighbors as 0.0 (matches the reference's zero padding at
    image borders)."""
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id", "label", F.col("embedding").alias("emb"),
        F.posexplode("embedding").alias("pos", "x_raw"),
    )
    get_d = lambda idx: F.get(F.col("emb"), idx).cast("double")  # noqa: E731
    return exploded.select(
        "vec_id",
        "label",
        "pos",
        F.col("x_raw").cast("double").alias("x"),
        F.coalesce(get_d(F.col("pos") - 1), F.lit(0.0)).alias("left_x"),
        F.coalesce(get_d(F.col("pos") + 1), F.lit(0.0)).alias("right_x"),
    )


def _tailcut_keep(t_pic: Column, t_bnd: Column) -> Column:
    """Two-threshold tailcut: keep a cell at or above the picture
    threshold, or at or above the boundary threshold when adjacent to a
    picture-level neighbor (denoising/tailcut semantics of the reference)."""
    return (F.col("x") >= t_pic) | (
        (F.col("x") >= t_bnd)
        & ((F.col("left_x") >= t_pic) | (F.col("right_x") >= t_pic))
    )


_TAILCUT_KEEP_SQL = (
    "(x >= {p} OR (x >= {b} AND (left_x >= {p} OR right_x >= {p})))"
)


@query(
    "pipe_clean_threshold",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL})
    SELECT
      vec_id,
      label,
      CAST(sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p=0.2, b=0.1)} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      round(sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p=0.2, b=0.1)} THEN x ELSE 0.0 END), 6) AS kept_energy
    FROM cells
    GROUP BY vec_id, label
    """,
)
def pipe_clean_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tailcut cleaning (T_pic=0.2, T_bnd=0.1): per-vector surviving-cell
    count and kept energy."""
    keep = _tailcut_keep(F.lit(0.2), F.lit(0.1))
    return (
        _cells(spark, sf_dir)
        .groupBy("vec_id", "label")
        .agg(
            bi(F.sum(keep.cast("int"))).alias("n_kept"),
            r6(F.sum(F.when(keep, F.col("x")).otherwise(0.0))).alias("kept_energy"),
        )
    )


@query(
    "pipe_clean_lowpass",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    sm AS (
      SELECT vec_id, label, pos, x,
             avg(x) OVER (
               PARTITION BY vec_id ORDER BY pos
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
             ) AS smoothed
      FROM cells
    )
    SELECT vec_id, label,
           CAST(sum(CASE WHEN smoothed >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN smoothed >= 0.1 THEN x ELSE 0.0 END), 6)     AS kept_energy,
           round(sum(smoothed), 6)                                          AS smoothed_energy
    FROM sm
    GROUP BY vec_id, label
    """,
)
def pipe_clean_lowpass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-pass cleaning analogue (the reference's FFT/wavelet denoising
    family next to tailcut): a ±2-cell moving-average smooths each vector,
    cells are kept where the SMOOTHED signal clears the threshold —
    suppressing isolated spikes that raw thresholding keeps. The smoothing
    window partitions by vector, so the convolution is one windowed pass,
    no self-join; frame truncation at vector edges matches on both
    engines (ROWS frames)."""
    w = (
        Window.partitionBy("vec_id")
        .orderBy("pos")
        .rowsBetween(-2, 2)
    )
    sm = _cells(spark, sf_dir).withColumn("smoothed", F.avg("x").over(w))
    keep = F.col("smoothed") >= 0.1
    return sm.groupBy("vec_id", "label").agg(
        bi(F.sum(keep.cast("int"))).alias("n_kept"),
        r6(F.sum(F.when(keep, F.col("x")).otherwise(0.0))).alias("kept_energy"),
        r6(F.sum("smoothed")).alias("smoothed_energy"),
    )


@query(
    "pipe_feature_moments",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    agg AS (
      SELECT vec_id, label,
             sum(greatest(x, 0.0))       AS size_,
             sum(pos * greatest(x, 0.0)) AS swx,
             sum(pos * pos * greatest(x, 0.0)) AS swx2
      FROM cells GROUP BY vec_id, label
    )
    SELECT vec_id, label,
           round(size_, 6)                                    AS size,
           round(swx / nullif(size_, 0.0), 6)                 AS centroid,
           round(sqrt(greatest(
             swx2 / nullif(size_, 0.0)
               - (swx / nullif(size_, 0.0)) * (swx / nullif(size_, 0.0)),
             0.0)), 6)                                        AS width
    FROM agg
    """,
)
def pipe_feature_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hillas-analogue 1-D moments per vector over clipped-positive
    amplitude w=max(x,0): size Σw, centroid Σi·w/Σw, width (2nd central
    moment)^0.5 — the feature-extraction stage of the reference."""
    w = F.greatest(F.col("x"), F.lit(0.0))
    agg = (
        _cells(spark, sf_dir)
        .groupBy("vec_id", "label")
        .agg(
            F.sum(w).alias("size_"),
            F.sum(F.col("pos") * w).alias("swx"),
            F.sum(F.col("pos") * F.col("pos") * w).alias("swx2"),
        )
    )
    size_nz = F.nullif(F.col("size_"), F.lit(0.0))
    centroid = F.col("swx") / size_nz
    return agg.select(
        "vec_id",
        "label",
        r6(F.col("size_")).alias("size"),
        r6(centroid).alias("centroid"),
        r6(F.sqrt(F.greatest(F.col("swx2") / size_nz - centroid * centroid, F.lit(0.0)))).alias(
            "width"
        ),
    )


@query(
    "pipe_score_mse",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL})
    SELECT
      vec_id, label,
      round(avg(CASE WHEN x >= 0.15 THEN 0.0 ELSE x * x END), 6) AS mse,
      round(sqrt(avg(CASE WHEN x >= 0.15 THEN 0.0 ELSE x * x END))
            / nullif(max(x) - min(x), 0.0), 6)                   AS nrmse
    FROM cells
    GROUP BY vec_id, label
    """,
)
def pipe_score_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assessment-stage analogue: MSE / range-normalized RMSE between the
    raw vector and its simple-threshold cleaning (x kept iff x ≥ 0.15, so
    the residual is x on suppressed cells)."""
    sq_err = F.when(F.col("x") >= 0.15, F.lit(0.0)).otherwise(F.col("x") * F.col("x"))
    return (
        _cells(spark, sf_dir)
        .groupBy("vec_id", "label")
        .agg(
            r6(F.avg(sq_err)).alias("mse"),
            r6(
                F.sqrt(F.avg(sq_err)) / F.nullif(F.max("x") - F.min("x"), F.lit(0.0))
            ).alias("nrmse"),
        )
    )


_SWEEP_GRID = [(0.15, 0.05), (0.2, 0.05), (0.2, 0.1), (0.25, 0.1), (0.3, 0.15)]
_SWEEP_VALUES_SQL = ", ".join(f"({p}, {b})" for p, b in _SWEEP_GRID)


@query(
    "pipe_param_sweep",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    grid AS (
      SELECT CAST(t_pic AS DOUBLE) AS t_pic, CAST(t_bnd AS DOUBLE) AS t_bnd
      FROM (VALUES {_SWEEP_VALUES_SQL}) v(t_pic, t_bnd)
    ),
    per_vec AS (
      SELECT t_pic, t_bnd, vec_id,
             sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p="t_pic", b="t_bnd")} THEN x ELSE 0.0 END) AS kept_energy,
             sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p="t_pic", b="t_bnd")} THEN 1.0 ELSE 0.0 END) AS n_kept
      FROM cells CROSS JOIN grid
      GROUP BY t_pic, t_bnd, vec_id
    )
    SELECT t_pic, t_bnd,
           round(avg(kept_energy), 6) AS avg_kept_energy,
           round(avg(n_kept), 6)      AS avg_n_kept,
           count(*)                   AS n_vectors
    FROM per_vec
    GROUP BY t_pic, t_bnd
    """,
)
def pipe_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter sweep (optimization-stage analogue): the whole grid
    costs ONE corpus pass — the reference re-ran the full pipeline per
    grid point. Round 13 (guide §2.3 "aggregate before you shuffle"):
    the grid rides as 2·|grid| conditional aggregate COLUMNS through one
    vec-keyed aggregation instead of broadcast-cross-joining |grid|
    copies of every cell row — the shuffled row count drops |grid|×
    (5× here) and the 5-row grid reshape (a `stack`) runs on the one-row
    global aggregate, where EXPAND is free. Per-vector sums and their
    averages are the identical doubles, just never materialized as rows
    (measured sf0.1 0.74 → 0.47 s, 10× scale 1.10 → 0.51 s; frames
    byte-equal). A driver-side optimizer (e.g. differential evolution)
    would iterate exactly this op on successive small grids
    (pipe_optimize_threshold does)."""
    aggs = []
    for i, (p, b) in enumerate(_SWEEP_GRID):
        keep = _tailcut_keep(F.lit(p), F.lit(b))
        aggs.append(F.sum(F.when(keep, F.col("x")).otherwise(0.0)).alias(f"ke_{i}"))
        aggs.append(F.sum(F.when(keep, F.lit(1.0)).otherwise(0.0)).alias(f"nk_{i}"))
    per_vec = _cells(spark, sf_dir).groupBy("vec_id").agg(*aggs)
    final = per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.avg(f"ke_{i}").alias(f"ake_{i}") for i in range(len(_SWEEP_GRID))],
        *[F.avg(f"nk_{i}").alias(f"ank_{i}") for i in range(len(_SWEEP_GRID))],
    )
    stack_expr = (
        "stack({n}, {args}) as (t_pic, t_bnd, ake, ank)".format(
            n=len(_SWEEP_GRID),
            args=", ".join(
                f"CAST({p} AS DOUBLE), CAST({b} AS DOUBLE), ake_{i}, ank_{i}"
                for i, (p, b) in enumerate(_SWEEP_GRID)
            ),
        )
    )
    # empty-corpus guard (ADVICE r13): the global agg always yields one
    # row, so an empty corpus would stack into |grid| NULL-avg rows where
    # the old groupBy form returned an empty frame — filter restores that
    return final.where(F.col("n_vectors") > 0).select(
        F.expr(stack_expr), "n_vectors"
    ).select(
        "t_pic",
        "t_bnd",
        r6(F.col("ake")).alias("avg_kept_energy"),
        r6(F.col("ank")).alias("avg_n_kept"),
        F.col("n_vectors"),
    )


@query(
    "pipe_kill_isolated",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL})
    SELECT
      vec_id, label,
      CAST(sum(CASE WHEN x >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_mask,
      CAST(sum(CASE WHEN x >= 0.15 AND left_x < 0.15 AND right_x < 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_killed,
      round(sum(CASE WHEN x >= 0.15 AND NOT (left_x < 0.15 AND right_x < 0.15)
                     THEN x ELSE 0.0 END), 6) AS surviving_energy
    FROM cells
    GROUP BY vec_id, label
    """,
)
def pipe_kill_isolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolated-cell removal (kill_isolated_pixels analogue, 1-D): a
    masked cell (x ≥ 0.15) dies when both neighbors are below mask level;
    reports mask size, kills, and surviving energy per vector."""
    m = F.col("x") >= 0.15
    isolated = m & (F.col("left_x") < 0.15) & (F.col("right_x") < 0.15)
    return (
        _cells(spark, sf_dir)
        .groupBy("vec_id", "label")
        .agg(
            bi(F.sum(m.cast("int"))).alias("n_mask"),
            bi(F.sum(isolated.cast("int"))).alias("n_killed"),
            r6(F.sum(F.when(m & ~isolated, F.col("x")).otherwise(0.0))).alias(
                "surviving_energy"
            ),
        )
    )


_ALGO_GRID = [
    ("null", -999.0, -999.0),
    ("simple_0.15", 0.15, 0.15),
    ("tailcut_loose", 0.15, 0.05),
    ("tailcut_tight", 0.25, 0.1),
]
_ALGO_VALUES_SQL = ", ".join(f"('{a}', {p}, {b})" for a, p, b in _ALGO_GRID)


@query(
    "pipe_benchmark_report",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    algos AS (
      SELECT algo, CAST(t_pic AS DOUBLE) AS t_pic, CAST(t_bnd AS DOUBLE) AS t_bnd
      FROM (VALUES {_ALGO_VALUES_SQL}) v(algo, t_pic, t_bnd)
    ),
    per_vec AS (
      SELECT algo, t_pic, t_bnd, vec_id,
             sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p="t_pic", b="t_bnd")} THEN x ELSE 0.0 END) AS kept_energy,
             sum(CASE WHEN {_TAILCUT_KEEP_SQL.format(p="t_pic", b="t_bnd")} THEN 1.0 ELSE 0.0 END) AS n_kept,
             avg(CASE WHEN {_TAILCUT_KEEP_SQL.format(p="t_pic", b="t_bnd")} THEN 0.0 ELSE x * x END) AS mse
      FROM cells CROSS JOIN algos
      GROUP BY algo, t_pic, t_bnd, vec_id
    )
    SELECT algo, t_pic, t_bnd,
           round(avg(kept_energy), 6) AS avg_kept_energy,
           round(avg(n_kept), 6)      AS avg_n_kept,
           round(avg(mse), 6)         AS avg_mse,
           count(*)                   AS n_vectors
    FROM per_vec
    GROUP BY algo, t_pic, t_bnd
    """,
)
def pipe_benchmark_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-report analogue (AbstractCleaningAlgorithm.run): one score
    row per cleaning algorithm config — kept energy, surviving cells, and
    cleaning MSE averaged over the corpus. The reference accumulated this
    as JSON per image file; here it is one declarative plan (and can be
    written with df.write.json — sinks are covered in §2-A). Round 13:
    same column-form sweep as pipe_param_sweep (guide §2.3) — the algo
    grid rides as 3·|algos| aggregate columns through one vec-keyed
    pass; no |algos|× row expansion before the shuffle."""
    aggs = []
    for i, (_, p, b) in enumerate(_ALGO_GRID):
        keep = _tailcut_keep(F.lit(p), F.lit(b))
        aggs.append(F.sum(F.when(keep, F.col("x")).otherwise(0.0)).alias(f"ke_{i}"))
        aggs.append(F.sum(F.when(keep, F.lit(1.0)).otherwise(0.0)).alias(f"nk_{i}"))
        aggs.append(
            F.avg(F.when(keep, F.lit(0.0)).otherwise(F.col("x") * F.col("x"))).alias(f"mse_{i}")
        )
    per_vec = _cells(spark, sf_dir).groupBy("vec_id").agg(*aggs)
    final = per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.avg(f"ke_{i}").alias(f"ake_{i}") for i in range(len(_ALGO_GRID))],
        *[F.avg(f"nk_{i}").alias(f"ank_{i}") for i in range(len(_ALGO_GRID))],
        *[F.avg(f"mse_{i}").alias(f"amse_{i}") for i in range(len(_ALGO_GRID))],
    )
    stack_expr = "stack({n}, {args}) as (algo, t_pic, t_bnd, ake, ank, amse)".format(
        n=len(_ALGO_GRID),
        args=", ".join(
            f"'{a}', CAST({p} AS DOUBLE), CAST({b} AS DOUBLE), ake_{i}, ank_{i}, amse_{i}"
            for i, (a, p, b) in enumerate(_ALGO_GRID)
        ),
    )
    # empty-corpus guard (ADVICE r13) — see pipe_param_sweep
    return final.where(F.col("n_vectors") > 0).select(
        F.expr(stack_expr), "n_vectors"
    ).select(
        "algo",
        "t_pic",
        "t_bnd",
        r6(F.col("ake")).alias("avg_kept_energy"),
        r6(F.col("ank")).alias("avg_n_kept"),
        r6(F.col("amse")).alias("avg_mse"),
        F.col("n_vectors"),
    )


def _sweep_objective(spark: SparkSession, sf_dir: str, grid: list[tuple[float, float]]):
    """Evaluate the cleaning objective for a threshold grid in ONE corpus
    pass (the inner evaluation of the optimizer below). Objective: keep
    energy, penalize kept-cell count — avg_kept_energy − 0.01·avg_n_kept.
    Round 13: column-form sweep (see pipe_param_sweep) — 2·|grid|
    aggregate columns instead of a |grid|× cross-join row expansion, so
    each optimizer iteration shuffles one row per vector."""
    aggs = []
    for i, (p, b) in enumerate(grid):
        keep = _tailcut_keep(F.lit(p), F.lit(b))
        aggs.append(F.sum(F.when(keep, F.col("x")).otherwise(0.0)).alias(f"ke_{i}"))
        aggs.append(F.sum(F.when(keep, F.lit(1.0)).otherwise(0.0)).alias(f"nk_{i}"))
    per_vec = _cells(spark, sf_dir).groupBy("vec_id").agg(*aggs)
    final = per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.avg(f"ke_{i}").alias(f"ake_{i}") for i in range(len(grid))],
        *[F.avg(f"nk_{i}").alias(f"ank_{i}") for i in range(len(grid))],
    )
    stack_expr = "stack({n}, {args}) as (t_pic, t_bnd, ake, ank)".format(
        n=len(grid),
        args=", ".join(
            f"CAST({p} AS DOUBLE), CAST({b} AS DOUBLE), ake_{i}, ank_{i}"
            for i, (p, b) in enumerate(grid)
        ),
    )
    # empty-corpus guard (ADVICE r13): without it an empty corpus stacks
    # into |grid| NULL objectives and pipe_optimize_threshold's
    # driver-side max() raises TypeError comparing None — the old
    # groupBy form returned an empty frame, restored here
    return final.where(F.col("n_vectors") > 0).select(F.expr(stack_expr)).select(
        "t_pic",
        "t_bnd",
        r6(F.col("ake") - 0.01 * F.col("ank")).alias("objective"),
    )


@query(
    "pipe_optimize_threshold",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    d1 AS (SELECT * FROM (VALUES (-0.1), (0.0), (0.1)) v(d)),
    g1 AS MATERIALIZED (
      SELECT DISTINCT round(greatest(0.2 + a.d, 0.01), 4) AS t_pic,
                      round(greatest(0.1 + c.d, 0.005), 4) AS t_bnd
      FROM d1 a CROSS JOIN d1 c
    ),
    s1 AS MATERIALIZED (
      SELECT t_pic, t_bnd, round(avg(ke) - 0.01 * avg(nk), 6) AS objective
      FROM (
        SELECT g.t_pic, g.t_bnd, cells.vec_id,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN x ELSE 0.0 END) AS ke,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN 1.0 ELSE 0.0 END) AS nk
        FROM cells CROSS JOIN g1 g
        GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    ),
    b1 AS MATERIALIZED (
      SELECT t_pic, t_bnd, objective FROM s1
      ORDER BY objective DESC, t_pic ASC, t_bnd ASC LIMIT 1
    ),
    d2 AS (SELECT * FROM (VALUES (-0.05), (0.0), (0.05)) v(d)),
    g2 AS MATERIALIZED (
      SELECT DISTINCT round(greatest(b.t_pic + a.d, 0.01), 4) AS t_pic,
                      round(greatest(b.t_bnd + c.d, 0.005), 4) AS t_bnd
      FROM d2 a CROSS JOIN d2 c, b1 b
    ),
    s2 AS MATERIALIZED (
      SELECT t_pic, t_bnd, round(avg(ke) - 0.01 * avg(nk), 6) AS objective
      FROM (
        SELECT g.t_pic, g.t_bnd, cells.vec_id,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN x ELSE 0.0 END) AS ke,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN 1.0 ELSE 0.0 END) AS nk
        FROM cells CROSS JOIN g2 g
        GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    ),
    b2 AS MATERIALIZED (
      SELECT t_pic, t_bnd, objective FROM s2
      ORDER BY objective DESC, t_pic ASC, t_bnd ASC LIMIT 1
    ),
    d3 AS (SELECT * FROM (VALUES (-0.025), (0.0), (0.025)) v(d)),
    g3 AS MATERIALIZED (
      SELECT DISTINCT round(greatest(b.t_pic + a.d, 0.01), 4) AS t_pic,
                      round(greatest(b.t_bnd + c.d, 0.005), 4) AS t_bnd
      FROM d3 a CROSS JOIN d3 c, b2 b
    ),
    s3 AS MATERIALIZED (
      SELECT t_pic, t_bnd, round(avg(ke) - 0.01 * avg(nk), 6) AS objective
      FROM (
        SELECT g.t_pic, g.t_bnd, cells.vec_id,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN x ELSE 0.0 END) AS ke,
               sum(CASE WHEN (x >= g.t_pic OR (x >= g.t_bnd AND (left_x >= g.t_pic OR right_x >= g.t_pic))) THEN 1.0 ELSE 0.0 END) AS nk
        FROM cells CROSS JOIN g3 g
        GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    ),
    b3 AS MATERIALIZED (
      SELECT t_pic, t_bnd, objective FROM s3
      ORDER BY objective DESC, t_pic ASC, t_bnd ASC LIMIT 1
    )
    SELECT CAST(0 AS BIGINT) AS iteration, t_pic, t_bnd, objective FROM b1
    UNION ALL
    SELECT CAST(1 AS BIGINT), t_pic, t_bnd, objective FROM b2
    UNION ALL
    SELECT CAST(2 AS BIGINT), t_pic, t_bnd, objective FROM b3
    """,
)
def pipe_optimize_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimization-driver analogue (the reference's third entry point: a
    scipy brute/differential-evolution loop re-running the WHOLE per-image
    pipeline per objective evaluation). Here: 3 deterministic grid-refine
    iterations, each evaluating its entire candidate grid in one
    broadcast-cross-join pass; the driver-side loop only shrinks the grid
    around the incumbent — O(iterations) Spark jobs total, not
    O(grid points × corpus passes). Returns the best point per iteration.
    Round 6: fully VALUE-ORACLED — the 3 refine iterations unroll as
    chained argmax CTEs (grid from the previous winner via the same
    clamp+round arithmetic, tiebreak objective DESC / t_pic / t_bnd);
    the hash certifies the whole optimize trajectory."""
    center, step = (0.2, 0.1), 0.1
    history = []
    for it in range(3):
        deltas = (-step, 0.0, step)
        grid = sorted(
            {
                (round(max(center[0] + dp, 0.01), 4), round(max(center[1] + db, 0.005), 4))
                for dp in deltas
                for db in deltas
            }
        )
        scored = _sweep_objective(spark, sf_dir, grid).collect()
        best = max(scored, key=lambda r: (r.objective, -r.t_pic, -r.t_bnd))
        history.append((it, float(best.t_pic), float(best.t_bnd), float(best.objective)))
        center, step = (best.t_pic, best.t_bnd), step / 2
    return spark.createDataFrame(
        history, "iteration long, t_pic double, t_bnd double, objective double"
    )


@query(
    "pipe_hillas_2d",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    g AS (
      SELECT vec_id, label,
             CAST(pos // 8 AS DOUBLE) AS gy, CAST(pos % 8 AS DOUBLE) AS gx,
             greatest(x, 0.0) AS w
      FROM cells
    ),
    m AS (
      SELECT vec_id, label,
             sum(w) AS size_,
             sum(gx * w) / nullif(sum(w), 0.0) AS mx,
             sum(gy * w) / nullif(sum(w), 0.0) AS my,
             sum(gx * gx * w) / nullif(sum(w), 0.0) AS mxx,
             sum(gy * gy * w) / nullif(sum(w), 0.0) AS myy,
             sum(gx * gy * w) / nullif(sum(w), 0.0) AS mxy
      FROM g GROUP BY 1, 2
    ),
    c AS (
      SELECT vec_id, label, size_, mx, my,
             mxx - mx * mx AS sxx, myy - my * my AS syy, mxy - mx * my AS sxy
      FROM m
    )
    SELECT vec_id, label,
           round(size_, 6) AS size,
           round(mx, 6) AS cog_x,
           round(my, 6) AS cog_y,
           round(sqrt(greatest((sxx + syy) / 2
                 + sqrt(pow((sxx - syy) / 2, 2) + sxy * sxy), 0.0)), 6) AS length,
           round(sqrt(greatest((sxx + syy) / 2
                 - sqrt(pow((sxx - syy) / 2, 2) + sxy * sxy), 0.0)), 6) AS width,
           round(atan2(2 * sxy, sxx - syy) / 2, 6) AS psi,
           round(sqrt(mx * mx + my * my), 6) AS r
    FROM c
    """,
)
def pipe_hillas_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL 2-D Hillas parametrization — the reference's signature
    feature extractor (image/hillas_parameters.py in the §0.1
    reconstruction): each 64-dim vector viewed as an 8×8 camera grid
    (pos → (row, col)), amplitude-weighted (w = max(x,0)) moments give
    size, center of gravity (cog_x, cog_y), and the shower-ellipse
    axes from the 2×2 second-moment matrix — length/width are the
    sqrt-eigenvalues λ± = (σxx+σyy)/2 ± sqrt(((σxx−σyy)/2)² + σxy²),
    psi = ½·atan2(2σxy, σxx−σyy) is the ellipse orientation, r the
    cog's distance from the camera center(-origin). The reference
    computed this per image in numpy; here the whole corpus is ONE
    posexplode + hash aggregation + per-row closed-form eigen
    arithmetic — no iteration, no UDF, shuffle keyed by (vec, label)."""
    g = _cells(spark, sf_dir).select(
        "vec_id",
        "label",
        (F.col("pos") / 8).cast("int").cast("double").alias("gy"),
        (F.col("pos") % 8).cast("double").alias("gx"),
        F.greatest(F.col("x"), F.lit(0.0)).alias("w"),
    )
    m = g.groupBy("vec_id", "label").agg(
        F.sum("w").alias("size_"),
        (F.sum(F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mx"),
        (F.sum(F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("my"),
        (F.sum(F.col("gx") * F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxx"),
        (F.sum(F.col("gy") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("myy"),
        (F.sum(F.col("gx") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxy"),
    )
    sxx = F.col("mxx") - F.col("mx") * F.col("mx")
    syy = F.col("myy") - F.col("my") * F.col("my")
    sxy = F.col("mxy") - F.col("mx") * F.col("my")
    half_tr = (sxx + syy) / 2
    disc = F.sqrt(F.pow((sxx - syy) / 2, 2) + sxy * sxy)
    return m.select(
        "vec_id",
        "label",
        r6(F.col("size_")).alias("size"),
        r6(F.col("mx")).alias("cog_x"),
        r6(F.col("my")).alias("cog_y"),
        r6(F.sqrt(F.greatest(half_tr + disc, F.lit(0.0)))).alias("length"),
        r6(F.sqrt(F.greatest(half_tr - disc, F.lit(0.0)))).alias("width"),
        r6(F.atan2(2 * sxy, sxx - syy) / 2).alias("psi"),
        r6(F.sqrt(F.col("mx") * F.col("mx") + F.col("my") * F.col("my"))).alias("r"),
    )


# -------------------------------------------- round-8 batch DG: 2-D depth

#: 2-D cell fragment (8×8 grid with 4-neighborhood, border-aware zero
#: padding) — the 2-D analogue of _CELLS_SQL. 1-based list indexing.
_CELLS2D_SQL = """
  SELECT vec_id, label, i AS pos,
         CAST(i // 8 AS DOUBLE) AS gy, CAST(i % 8 AS DOUBLE) AS gx,
         CAST(embedding[i + 1] AS DOUBLE) AS x,
         CASE WHEN i % 8 > 0 THEN coalesce(CAST(embedding[i] AS DOUBLE), 0.0) ELSE 0.0 END AS nl,
         CASE WHEN i % 8 < 7 THEN coalesce(CAST(embedding[i + 2] AS DOUBLE), 0.0) ELSE 0.0 END AS nr,
         CASE WHEN i >= 8 THEN coalesce(CAST(embedding[i - 7] AS DOUBLE), 0.0) ELSE 0.0 END AS nu,
         CASE WHEN i < 56 THEN coalesce(CAST(embedding[i + 9] AS DOUBLE), 0.0) ELSE 0.0 END AS nd
  FROM embeddings, range(0, 64) t(i)
"""


def _cells2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8×8-grid cells with the 4-neighborhood (left/right within the row,
    up/down across rows), borders zero-padded — all IN-ROW from the
    vector (F.get on the kept array), no neighbor join anywhere."""
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id", "label", F.col("embedding").alias("emb"),
        F.posexplode("embedding").alias("pos", "x_raw"),
    )
    get_d = lambda idx: F.get(F.col("emb"), idx).cast("double")  # noqa: E731
    z = F.lit(0.0)
    return exploded.select(
        "vec_id",
        "label",
        "pos",
        (F.col("pos") / 8).cast("int").cast("double").alias("gy"),
        (F.col("pos") % 8).cast("double").alias("gx"),
        F.col("x_raw").cast("double").alias("x"),
        F.when(F.col("pos") % 8 > 0, F.coalesce(get_d(F.col("pos") - 1), z))
        .otherwise(z)
        .alias("nl"),
        F.when(F.col("pos") % 8 < 7, F.coalesce(get_d(F.col("pos") + 1), z))
        .otherwise(z)
        .alias("nr"),
        F.when(F.col("pos") >= 8, F.coalesce(get_d(F.col("pos") - 8), z))
        .otherwise(z)
        .alias("nu"),
        F.when(F.col("pos") < 56, F.coalesce(get_d(F.col("pos") + 8), z))
        .otherwise(z)
        .alias("nd"),
    )


@query(
    "pipe_clean_tailcuts_2d",
    oracle=f"""
    WITH cells AS ({_CELLS2D_SQL})
    SELECT vec_id, label,
           CAST(sum(CASE WHEN x >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
           CAST(sum(CASE WHEN x >= 0.2 OR (x >= 0.1 AND
                     greatest(nl, nr, nu, nd) >= 0.2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN x >= 0.2 OR (x >= 0.1 AND
                     greatest(nl, nr, nu, nd) >= 0.2)
                     THEN x ELSE 0.0 END), 6) AS kept_sum
    FROM cells GROUP BY 1, 2
    """,
)
def pipe_clean_tailcuts_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's tailcuts cleaning in its TRUE 2-D form: a pixel
    survives if it clears the picture threshold, or clears the boundary
    threshold while any 4-NEIGHBOR on the camera grid clears the picture
    threshold (the 1-D lanes used row-neighbors only). Neighbor values
    come from the in-row array — no self-join on the pixel grid, so the
    whole corpus cleans in one posexplode + hash agg, embarrassingly
    parallel per image."""
    c = _cells2d(spark, sf_dir)
    core = F.col("x") >= 0.2
    keep = core | (
        (F.col("x") >= 0.1)
        & (F.greatest("nl", "nr", "nu", "nd") >= 0.2)
    )
    return c.groupBy("vec_id", "label").agg(
        bi(F.sum(core.cast("int"))).alias("n_core"),
        bi(F.sum(keep.cast("int"))).alias("n_kept"),
        r6(F.sum(F.when(keep, F.col("x")).otherwise(0.0))).alias("kept_sum"),
    )


#: shared per-image Hillas second-moment CTE (amplitude weights w ≥ 0)
_HILLAS_PARAMS_SQL = """
    g AS (
      SELECT vec_id, label,
             CAST(pos // 8 AS DOUBLE) AS gy, CAST(pos % 8 AS DOUBLE) AS gx,
             greatest(x, 0.0) AS w
      FROM cells
    ),
    m AS (
      SELECT vec_id, label,
             sum(w) AS size_,
             sum(gx * w) / nullif(sum(w), 0.0) AS mx,
             sum(gy * w) / nullif(sum(w), 0.0) AS my,
             sum(gx * gx * w) / nullif(sum(w), 0.0) AS mxx,
             sum(gy * gy * w) / nullif(sum(w), 0.0) AS myy,
             sum(gx * gy * w) / nullif(sum(w), 0.0) AS mxy
      FROM g GROUP BY 1, 2
    ),
    params AS (
      SELECT vec_id, label, size_, mx, my,
             atan2(2 * (mxy - mx * my),
                   (mxx - mx * mx) - (myy - my * my)) / 2 AS psi
      FROM m
    )
"""


@query(
    "pipe_hillas_skewness",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    {_HILLAS_PARAMS_SQL},
    proj AS (
      SELECT g.vec_id, g.label, g.w,
             (g.gx - p.mx) * cos(p.psi) + (g.gy - p.my) * sin(p.psi) AS l
      FROM g JOIN params p USING (vec_id, label)
    ),
    mom AS (
      SELECT vec_id, label,
             sum(w * l * l) / nullif(sum(w), 0.0) AS m2,
             sum(w * l * l * l) / nullif(sum(w), 0.0) AS m3,
             sum(w * l * l * l * l) / nullif(sum(w), 0.0) AS m4
      FROM proj GROUP BY 1, 2
    )
    SELECT vec_id, label,
           round(m3 / nullif(pow(m2, 1.5), 0.0), 6) AS skewness,
           round(m4 / nullif(m2 * m2, 0.0), 6) AS kurtosis
    FROM mom
    """,
)
def pipe_hillas_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longitudinal third/fourth Hillas moments — skewness and kurtosis
    of the amplitude distribution PROJECTED onto the shower's major axis
    (the asymmetry/peakedness features CTA analyses cut on after
    length/width). Two-phase by necessity: the projection axis (psi,
    cog) is itself a per-image aggregate, so phase 1 reduces to O(images)
    parameter rows and phase 2 re-joins them onto the cells (keyed join,
    AQE decides the strategy — the params side is image-count-sized) and
    folds the weighted l², l³, l⁴ sufficient statistics in one agg."""
    g = _cells(spark, sf_dir).select(
        "vec_id",
        "label",
        (F.col("pos") / 8).cast("int").cast("double").alias("gy"),
        (F.col("pos") % 8).cast("double").alias("gx"),
        F.greatest(F.col("x"), F.lit(0.0)).alias("w"),
    )
    m = g.groupBy("vec_id", "label").agg(
        (F.sum(F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mx"),
        (F.sum(F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("my"),
        (F.sum(F.col("gx") * F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxx"),
        (F.sum(F.col("gy") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("myy"),
        (F.sum(F.col("gx") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxy"),
    )
    params = m.select(
        "vec_id",
        "label",
        "mx",
        "my",
        (
            F.atan2(
                2 * (F.col("mxy") - F.col("mx") * F.col("my")),
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                - (F.col("myy") - F.col("my") * F.col("my")),
            )
            / 2
        ).alias("psi"),
    )
    proj = g.join(params, ["vec_id", "label"]).select(
        "vec_id",
        "label",
        "w",
        (
            (F.col("gx") - F.col("mx")) * F.cos("psi")
            + (F.col("gy") - F.col("my")) * F.sin("psi")
        ).alias("l"),
    )
    mom = proj.groupBy("vec_id", "label").agg(
        (F.sum(F.col("w") * F.col("l") * F.col("l")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("m2"),
        (F.sum(F.col("w") * F.pow("l", 3)) / F.nullif(F.sum("w"), F.lit(0.0))).alias("m3"),
        (F.sum(F.col("w") * F.pow("l", 4)) / F.nullif(F.sum("w"), F.lit(0.0))).alias("m4"),
    )
    return mom.select(
        "vec_id",
        "label",
        r6(F.col("m3") / F.nullif(F.pow("m2", 1.5), F.lit(0.0))).alias("skewness"),
        r6(F.col("m4") / F.nullif(F.col("m2") * F.col("m2"), F.lit(0.0))).alias("kurtosis"),
    )


@query(
    "pipe_stereo_intersect",
    oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    {_HILLAS_PARAMS_SQL},
    tel AS (
      SELECT CAST(vec_id // 2 AS BIGINT) AS pair_id,
             vec_id % 2 AS tel, mx, my, psi
      FROM params
    ),
    pairs AS (
      SELECT a.pair_id,
             a.mx AS ax, a.my AS ay, a.psi AS apsi,
             b.mx AS bx, b.my AS by, b.psi AS bpsi,
             sin(b.psi - a.psi) AS det
      FROM tel a JOIN tel b ON a.pair_id = b.pair_id
       AND a.tel = 0 AND b.tel = 1
    )
    SELECT pair_id,
           round(ax + ((bx - ax) * sin(bpsi) - (by - ay) * cos(bpsi)) / det
                      * cos(apsi), 4) AS core_x,
           round(ay + ((bx - ax) * sin(bpsi) - (by - ay) * cos(bpsi)) / det
                      * sin(apsi), 4) AS core_y,
           round(abs(det), 6) AS stereo_weight
    FROM pairs
    WHERE abs(det) >= 0.1
    """,
)
def pipe_stereo_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO reconstruction — the step after Hillas in every multi-
    telescope CTA analysis: two cameras (here: consecutive vec_ids
    paired as telescopes 0/1) see the same shower as two ellipses, and
    the shower core is the INTERSECTION of their major axes. Closed-form
    2-line intersection from each image's (cog, psi); |sin Δψ| is the
    standard stereo weight, and near-parallel pairs (|det| < 0.1) are
    dropped exactly as real reconstructions discard ill-conditioned
    geometry (they also amplify float dust unboundedly — the r4 output
    quantization plus the det floor keeps the lane hash-stable). One
    Hillas agg + one pair-keyed self-join of the O(images) parameter
    table — the heavy cells never join anything."""
    g = _cells(spark, sf_dir).select(
        "vec_id",
        (F.col("pos") / 8).cast("int").cast("double").alias("gy"),
        (F.col("pos") % 8).cast("double").alias("gx"),
        F.greatest(F.col("x"), F.lit(0.0)).alias("w"),
    )
    m = g.groupBy("vec_id").agg(
        (F.sum(F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mx"),
        (F.sum(F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("my"),
        (F.sum(F.col("gx") * F.col("gx") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxx"),
        (F.sum(F.col("gy") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("myy"),
        (F.sum(F.col("gx") * F.col("gy") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias("mxy"),
    )
    params = m.select(
        "vec_id",
        "mx",
        "my",
        (
            F.atan2(
                2 * (F.col("mxy") - F.col("mx") * F.col("my")),
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                - (F.col("myy") - F.col("my") * F.col("my")),
            )
            / 2
        ).alias("psi"),
    )
    tel = params.select(
        bi(F.col("vec_id") / 2).alias("pair_id"),
        (F.col("vec_id") % 2).alias("tel"),
        "mx",
        "my",
        "psi",
    )
    a = tel.where(F.col("tel") == 0).select(
        "pair_id",
        F.col("mx").alias("ax"),
        F.col("my").alias("ay"),
        F.col("psi").alias("apsi"),
    )
    b = tel.where(F.col("tel") == 1).select(
        "pair_id",
        F.col("mx").alias("bx"),
        F.col("my").alias("by"),
        F.col("psi").alias("bpsi"),
    )
    p = a.join(b, "pair_id").withColumn(
        "det", F.sin(F.col("bpsi") - F.col("apsi"))
    )
    t_a = (
        (F.col("bx") - F.col("ax")) * F.sin("bpsi")
        - (F.col("by") - F.col("ay")) * F.cos("bpsi")
    ) / F.col("det")
    return p.where(F.abs("det") >= 0.1).select(
        "pair_id",
        F.round(F.col("ax") + t_a * F.cos("apsi"), 4).alias("core_x"),
        F.round(F.col("ay") + t_a * F.sin("apsi"), 4).alias("core_y"),
        r6(F.abs("det")).alias("stereo_weight"),
    )
