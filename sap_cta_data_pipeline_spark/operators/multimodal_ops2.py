"""§2 round-9 batch FU — voice-activity detection over the framed-audio
plumbing.

``multimodal_audio_vad_segments``: energy-threshold VAD — the first
step of every speech-data pipeline (segment before you transcribe):
the synthetic raw-f32-pcm waveforms decode in the SAME Arrow-batched
mapInPandas stage as multimodal_audio_frames (real decode is
env-gated; the Spark-side plumbing is what's under test), frames are
ACTIVE when their 6-dp-quantized RMS exceeds the asset's mean quantized
frame RMS (quantize-then-compare makes the threshold ulp-proof across
engines), and contiguous active frames collapse to segments via the
index-minus-rank run identity (the events_run_length shape at frame
grain). Emits (asset, segment_start_frame, n_frames, sum_rms — the
exact DECIMAL energy total; a divided mean can flip on half-ulp
rounding boundaries across engines, the sum cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import bi, r6
from ..registry import query
from .multimodal_ops import synthesize_media

_FRAME = 16
_N_FRAMES = 4


@query(
    "multimodal_audio_vad_segments",
    oracle=f"""
    WITH frames AS (
      SELECT vec_id AS asset_id, f.f AS frame_idx,
             CAST(round(sqrt(list_sum(list_transform(
               embedding[f.f * {_FRAME} + 1 : f.f * {_FRAME} + {_FRAME}],
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / {_FRAME}.0),
               6) AS DECIMAL(18,6)) AS rms6
      FROM embeddings, LATERAL (SELECT unnest(range(0, {_N_FRAMES})) AS f) f
      WHERE CAST(label AS INTEGER) % 3 = 1
    ),
    thresh AS (
      SELECT asset_id, frame_idx, rms6,
             CAST(sum(rms6) OVER (PARTITION BY asset_id) AS DOUBLE)
               / {_N_FRAMES} AS bar
      FROM frames
    ),
    act AS (
      SELECT asset_id, frame_idx, rms6 FROM thresh
      WHERE CAST(rms6 AS DOUBLE) > bar
    ),
    runs AS (
      SELECT asset_id, frame_idx, rms6,
             frame_idx - row_number() OVER (
               PARTITION BY asset_id ORDER BY frame_idx) AS grp
      FROM act
    )
    SELECT asset_id,
           CAST(min(frame_idx) AS BIGINT) AS segment_start_frame,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(rms6) AS DOUBLE) AS sum_rms
    FROM runs GROUP BY asset_id, grp
    """,
)
def multimodal_audio_vad_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Energy VAD on the decoded waveforms: frame RMS from the Arrow
    mapInPandas decode (identical stage to multimodal_audio_frames),
    QUANTIZED to 6 dp before any comparison — threshold and segment
    means then operate on exact DECIMAL values, so the active set is
    bit-identical across engines. Active = rms6 > asset mean rms6
    (asset-partitioned window), segments via index−rank grouping; the
    per-segment energy emits as the EXACT decimal sum (a divided mean
    hits half-ulp rounding boundaries across engines — observed at
    sf0.1 — so the contract is the sum).
    Planted pins: a [loud, quiet, loud, loud] asset yields segments
    (0,1) and (2,2); a constant-energy asset yields none (nothing
    strictly exceeds the mean).

    Scale: decode+frame is one zero-shuffle Arrow pass; the threshold
    and run windows are asset-partitioned (parallel per file) — the
    same plan a real PCM VAD sweep runs at 100 TB."""
    import numpy as np
    import pandas as pd

    media = synthesize_media(spark, sf_dir).filter(
        F.col("media_type") == "audio"
    )

    def frame_rms(batches):
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.float32).astype(
                    np.float64
                )
                for f in range(_N_FRAMES):
                    fr = x[f * _FRAME : (f + 1) * _FRAME]
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": f,
                            "rms": float(np.sqrt((fr * fr).mean())),
                        }
                    )
            yield pd.DataFrame(out)

    framed = media.select("asset_id", "payload").mapInPandas(
        frame_rms, schema="asset_id bigint, frame_idx bigint, rms double"
    )
    # JVM-side HALF_UP rounding (parity.r6), then DECIMAL exactness
    fr = framed.select(
        "asset_id",
        "frame_idx",
        r6(F.col("rms")).cast("decimal(18,6)").alias("rms6"),
    )
    wasset = Window.partitionBy("asset_id")
    act = fr.select(
        "*",
        (
            F.sum("rms6").over(wasset).cast("double") / _N_FRAMES
        ).alias("bar"),
    ).filter(F.col("rms6").cast("double") > F.col("bar"))
    wseq = Window.partitionBy("asset_id").orderBy("frame_idx")
    runs = act.select(
        "asset_id",
        "frame_idx",
        "rms6",
        (F.col("frame_idx") - F.row_number().over(wseq)).alias("grp"),
    )
    return (
        runs.groupBy("asset_id", "grp")
        .agg(
            bi(F.min("frame_idx")).alias("segment_start_frame"),
            bi(F.count(F.lit(1))).alias("n_frames"),
            F.sum("rms6").cast("double").alias("sum_rms"),
        )
        .drop("grp")
    )
