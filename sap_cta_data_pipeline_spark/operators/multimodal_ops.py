"""§2-J multimodal binary-column lane, driver-visible (VERDICT r1 item 4).

`functions/multimodal.py` holds the real plumbing — binary payload
synthesis, the stubbed codec boundary, mapInPandas featurize/resize/
frame-sample stages. This module registers the end-to-end pipeline as a
driver-checkable query so the "multimodal columns" north-star bullet has
a CORRECTNESS row.

The oracle is possible because the synthetic payloads are deterministic:
an asset's payload is the float32 byte-packing of its embedding, so
DuckDB can recompute the decoded-sample moments straight from the
`embeddings` table while Spark goes the long way round — pack to binary
→ Arrow batch into Python → decode bytes → numpy moments. A value match
therefore certifies the whole binary round-trip, not just the math.
(crc32 is computed and pytest-covered but excluded here: no DuckDB twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import extract_features, synthesize_media
from ..functions.parity import r6
from ..registry import query


@query(
    "multimodal_features",
    oracle="""
    SELECT
      vec_id                                   AS asset_id,
      CASE CAST(label AS INTEGER) % 3
        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
      END                                      AS media_type,
      CAST(256 AS BIGINT)                      AS n_bytes,
      round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64.0, 6) AS sample_mean,
      round(sqrt(
        list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / 64.0
        - (list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64.0) ^ 2
      ), 6)                                    AS sample_std
    FROM embeddings
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize binary media assets → decode (raw-f32 stub codec) →
    featurize, all through the Arrow/mapInPandas lane; emit per-asset
    decoded-sample statistics. Two mapInPandas stages, zero shuffle —
    at 100 TB the only partitioning decision is Arrow batch sizing
    (decoded-footprint-bounded) and an optional repartition before the
    decode to spread hot media partitions."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        r6(F.col("sample_mean")).alias("sample_mean"),
        r6(F.col("sample_std")).alias("sample_std"),
    )


@query(
    "multimodal_framesample",
    oracle="""
    SELECT e.vec_id AS asset_id,
           CAST(k.f AS BIGINT)  AS frame_idx,
           CAST(64 AS BIGINT)   AS n_bytes,
           round(list_sum(list_transform(
             list_slice(e.embedding, 16 * k.f + 1, 16 * (k.f + 1)),
             x -> CAST(x AS DOUBLE))) / 16.0, 6) AS frame_mean
    FROM embeddings e, (VALUES (0), (2)) k(f)
    WHERE CAST(e.label AS INTEGER) % 3 = 2
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling pipeline: synthesize → sample every 2nd frame
    (one-to-many mapInPandas, UDTF-shaped) → per-frame decode + moments.
    Exercises the row-expanding media stage the driver couldn't see before
    (sample_frames/frame_stats were pytest-only plumbing). The oracle
    recomputes each sampled frame's mean from the embedding slice the
    payload was packed from, certifying the byte-slicing arithmetic of the
    frame splitter, not just the stats."""
    from ..functions.multimodal import frame_stats, sample_frames

    frames = sample_frames(synthesize_media(spark, sf_dir), every_n=2)
    return frame_stats(frames)


@query(
    "multimodal_resize",
    oracle="""
    SELECT vec_id          AS asset_id,
           CAST(64 AS BIGINT) AS n_bytes,
           round((
             CAST(embedding[1]  AS DOUBLE) + CAST(embedding[3]  AS DOUBLE) +
             CAST(embedding[5]  AS DOUBLE) + CAST(embedding[7]  AS DOUBLE) +
             CAST(embedding[17] AS DOUBLE) + CAST(embedding[19] AS DOUBLE) +
             CAST(embedding[21] AS DOUBLE) + CAST(embedding[23] AS DOUBLE) +
             CAST(embedding[33] AS DOUBLE) + CAST(embedding[35] AS DOUBLE) +
             CAST(embedding[37] AS DOUBLE) + CAST(embedding[39] AS DOUBLE) +
             CAST(embedding[49] AS DOUBLE) + CAST(embedding[51] AS DOUBLE) +
             CAST(embedding[53] AS DOUBLE) + CAST(embedding[55] AS DOUBLE)
           ) / 16.0, 6) AS sample_mean
    FROM embeddings
    WHERE CAST(label AS INTEGER) % 3 = 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize lane: synthesize → nearest-neighbor resize 8×8→4×4 →
    decode + featurize, three mapInPandas stages, zero shuffle. The
    oracle recomputes the mean of exactly the 16 grid samples the
    nearest-neighbor resizer must pick (rows/cols 0,2,4,6 of the 8×8
    grid), so a value match certifies the index arithmetic of the
    resize, not just the byte plumbing."""
    from ..functions.multimodal import resize_image

    resized = resize_image(synthesize_media(spark, sf_dir), 4, 4)
    feats = extract_features(resized)
    return feats.where(F.col("media_type") == "image").select(
        "asset_id", "n_bytes", r6(F.col("sample_mean")).alias("sample_mean")
    )
