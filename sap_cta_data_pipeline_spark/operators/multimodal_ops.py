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
from ..functions.parity import bi, r6
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


@query(
    "multimodal_phash_dedup",
    oracle="""
    WITH img0 AS (
      SELECT vec_id AS asset_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS px
      FROM embeddings WHERE CAST(label AS INTEGER) % 3 = 0
    ), planted AS (
      SELECT asset_id + 1000000 AS asset_id,
             list_transform(range(1, 65),
               i -> CASE WHEN i = 1 THEN CAST(CAST(px[i] + 0.5 AS REAL) AS DOUBLE)
                         ELSE px[i] END) AS px
      FROM img0 WHERE asset_id % 7 = 0
    ), img AS (
      SELECT * FROM img0 UNION ALL SELECT * FROM planted
    ), h AS (
      SELECT asset_id,
             CAST(list_sum(list_transform(range(1, 64),
                  i -> CASE WHEN px[i+1] > px[i]
                            THEN (CAST(1 AS BIGINT) << (i-1)) ELSE 0 END)) AS BIGINT) AS ph
      FROM img
    ), bands AS (
      SELECT asset_id, ph, b, (ph >> (CAST(b AS INTEGER) * 16)) & 65535 AS bv
      FROM h, (SELECT unnest(range(0, 4)) AS b) bs
    ), cand AS (
      SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
                      a.ph AS ha, b.ph AS hb
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bv = b.bv AND a.asset_id < b.asset_id
    )
    SELECT asset_a, asset_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 8
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over BINARY image assets —
    the dedup × multimodal cell of the matrix: image assets (plus planted
    deterministic "re-encodes": one f4-rounded +0.5 perturbation of the
    first pixel for every 7th asset) are packed to raw-f32 payloads,
    decoded back through the stubbed codec boundary, dHash-ed in the
    Arrow lane (bit i = px[i+1] > px[i] — pure comparisons, no float
    summation, so the hash is bit-exact across engines), then deduped
    JVM-side exactly like dedup_simhash: 4×16-bit band buckets, candidate
    self-join within a band, bit_count(xor) Hamming verify ≤ 8. The
    banded join is the 100 TB path (no all-pairs stage anywhere); recall
    is the standard LSH trade — a pair must agree on one whole band.
    A value match certifies payload pack → Arrow → decode → hash → band
    join end-to-end, because the oracle recomputes everything straight
    from the embeddings table."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    from ..catalog import load_table
    from ..functions.multimodal import _decode_payload

    emb = load_table(spark, sf_dir, "embeddings")
    px = F.transform("embedding", lambda x: x.cast("double"))
    img = emb.filter(F.col("label").cast("int") % 3 == 0).select(
        F.col("vec_id").alias("asset_id"), px.alias("px")
    )
    pert = (
        (F.element_at("px", 1) + F.lit(0.5)).cast("float").cast("double")
    )
    planted = img.filter(F.col("asset_id") % 7 == 0).select(
        (F.col("asset_id") + 1000000).alias("asset_id"),
        F.concat(F.array(pert), F.slice("px", 2, 63)).alias("px"),
    )
    assets = img.unionAll(planted)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": [
                        _struct.pack("<64f", *[float(v) for v in p]) for p in pdf["px"]
                    ],
                }
            )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                p = _decode_payload(bytes(payload), "raw-f32-8x8")
                ph = 0
                for i in range(63):
                    if p[i + 1] > p[i]:
                        ph |= 1 << i
                hashes.append(ph)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "ph": hashes})

    media = assets.mapInPandas(encode, schema="asset_id long, payload binary")
    h = media.mapInPandas(dhash, schema="asset_id long, ph long")
    bands = h.select(
        "asset_id",
        "ph",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("ph", 16 * b).bitwiseAND(F.lit(65535))
                    for b in range(4)
                ]
            )
        ).alias("b", "bv"),
    )
    a = bands.select(
        F.col("asset_id").alias("asset_a"), F.col("ph").alias("ha"), "b", "bv"
    )
    b = bands.select(
        F.col("asset_id").alias("asset_b"), F.col("ph").alias("hb"), "b", "bv"
    )
    cand = (
        a.join(b, ["b", "bv"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.filter(hamming <= 8)
        .select("asset_a", "asset_b", bi(hamming).alias("hamming"))
    )


@query(
    "multimodal_audio_frames",
    oracle="""
    SELECT vec_id                             AS asset_id,
           f.f                                AS frame_idx,
           round(sqrt(list_sum(list_transform(
             embedding[f.f * 16 + 1 : f.f * 16 + 16],
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / 16.0), 6)
             AS rms,
           round(list_max(list_transform(
             embedding[f.f * 16 + 1 : f.f * 16 + 16],
             x -> abs(CAST(x AS DOUBLE)))), 6) AS peak
    FROM embeddings, LATERAL (SELECT unnest(range(0, 4)) AS f) f
    WHERE CAST(label AS INTEGER) % 3 = 1
    """,
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing: each (synthetic raw-f32-pcm) waveform is decoded
    in an Arrow-batched mapInPandas stage and cut into 4 non-overlapping
    16-sample frames; per frame, RMS energy and absolute peak — the
    front end of every audio feature pipeline (VAD, loudness
    normalization, silence trimming). Zero shuffle: decode + frame +
    reduce all happen inside one pass over the binary column; at 100 TB
    the only knobs are Arrow batch size and a pre-decode repartition.
    The oracle recomputes frames straight from the embeddings table
    because payload == float32-packed embedding (same certification
    logic as multimodal_features)."""
    import numpy as np
    import pandas as pd

    media = synthesize_media(spark, sf_dir).filter(F.col("media_type") == "audio")

    def frame_stats(batches):
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.float32).astype(np.float64)
                for f in range(4):
                    fr = x[f * 16 : (f + 1) * 16]
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": f,
                            "rms": float(np.sqrt((fr * fr).mean())),
                            "peak": float(np.abs(fr).max()),
                        }
                    )
            yield pd.DataFrame(out)

    framed = media.select("asset_id", "payload").mapInPandas(
        frame_stats,
        schema="asset_id bigint, frame_idx bigint, rms double, peak double",
    )
    # rounding lives JVM-side (parity.r6 = HALF_UP like the oracle);
    # python round() is banker's and diverges on .xxxxxx5 boundaries
    return framed.select(
        "asset_id", "frame_idx", r6(F.col("rms")).alias("rms"),
        r6(F.col("peak")).alias("peak"),
    )


@query(
    "multimodal_video_motion",
    oracle="""
    WITH fr AS (
      SELECT vec_id AS asset_id, f.f AS frame_idx,
             list_transform(embedding[f.f * 16 + 1 : f.f * 16 + 16],
                            x -> CAST(x AS DOUBLE)) AS frame
      FROM embeddings, LATERAL (SELECT unnest(range(0, 4)) AS f) f
      WHERE CAST(label AS INTEGER) % 3 = 2
    )
    SELECT a.asset_id, a.frame_idx,
           round(list_sum(a.frame) / 16.0, 6) AS frame_mean,
           round(list_sum(list_transform(range(1, 17),
             i -> abs(a.frame[i] - b.frame[i]))) / 16.0, 6) AS motion
    FROM fr a JOIN fr b
      ON b.asset_id = a.asset_id AND b.frame_idx = a.frame_idx - 1
    """,
)
def multimodal_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video inter-frame motion proxy: decode the (synthetic raw-f32)
    4-frame clip in one mapInPandas pass, emit per-frame mean plus the
    mean absolute difference against the PREVIOUS frame (frames 1..3) —
    the scene-cut / motion-magnitude signal a video curation pipeline
    thresholds on. The temporal join happens INSIDE the decode pass
    (frames of one clip are colocated in its payload), so no shuffle
    exists at any scale; the oracle recomputes from the embeddings
    table via a frame self-join."""
    import numpy as np
    import pandas as pd

    media = synthesize_media(spark, sf_dir).filter(F.col("media_type") == "video")

    def motion(batches):
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.float32).astype(np.float64)
                frames = x.reshape(4, 16)
                for f in range(1, 4):
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": f,
                            "frame_mean": float(frames[f].mean()),
                            "motion": float(np.abs(frames[f] - frames[f - 1]).mean()),
                        }
                    )
            yield pd.DataFrame(out)

    framed = media.select("asset_id", "payload").mapInPandas(
        motion,
        schema="asset_id bigint, frame_idx bigint, frame_mean double, motion double",
    )
    return framed.select(
        "asset_id", "frame_idx", r6(F.col("frame_mean")).alias("frame_mean"),
        r6(F.col("motion")).alias("motion"),
    )


@query(
    "multimodal_wav_codec",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(least(greatest(floor(CAST(x AS DOUBLE) * 16384 + 0.5),
                                   -32768), 32767) AS BIGINT)) AS i16
      FROM embeddings
    )
    SELECT vec_id                                   AS asset_id,
           CAST(8000 AS BIGINT)                     AS sample_rate,
           CAST(64 AS BIGINT)                       AS n_samples,
           CAST(list_sum(i16) AS BIGINT)            AS sum_samples,
           round(CAST(list_sum(i16) AS DOUBLE) / 64, 6) AS mean_sample,
           round(sqrt(CAST(list_sum(list_transform(i16, v -> v * v)) AS DOUBLE) / 64), 6)
             AS rms
    FROM q
    """,
)
def multimodal_wav_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end (round 4 — the codec boundary narrowed
    from "everything stubbed" to "compressed formats only"): each
    embedding quantizes to PCM16 (floor(x·16384 + 0.5), clipped — the
    deterministic midpoint rule, not banker's rounding), ENCODES into a
    byte-exact RIFF/WAVE container, and the decode side WALKS THE REAL
    HEADER (chunk ids, fmt validation, word alignment — functions/
    multimodal.parse_wav_pcm16) before computing integer sample sums.
    The DuckDB oracle recomputes the same integers straight from the
    embeddings table, so a value match certifies the ENTIRE container
    round-trip: any header-arithmetic bug desynchronizes the data chunk
    and the hash catches it. One mapInPandas stage; sample_rate comes
    from the parsed header, not the synthesizer. RMS derives from exact
    integer Σx² — no float-order hazard."""
    import numpy as np
    import pandas as pd

    from ..catalog import load_table as t
    from ..functions.multimodal import encode_wav_pcm16, parse_wav_pcm16

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "sample_rate", "n_samples", "sum_samples",
                "mean_sample", "rms")}
            for vid, e in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(e, dtype=np.float64)
                i16 = np.clip(np.floor(x * 16384 + 0.5), -32768, 32767).astype(
                    np.int16
                )
                rate, back = parse_wav_pcm16(encode_wav_pcm16(i16, 8000))
                s = back.astype(np.int64)
                out["asset_id"].append(int(vid))
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(len(s))
                out["sum_samples"].append(int(s.sum()))
                out["mean_sample"].append(round(float(s.sum()) / len(s), 6))
                out["rms"].append(round(float(np.sqrt(float((s * s).sum()) / len(s))), 6))
            yield pd.DataFrame(out)

    return emb.mapInPandas(
        run,
        schema="asset_id bigint, sample_rate bigint, n_samples bigint,"
        " sum_samples bigint, mean_sample double, rms double",
    )


@query(
    "multimodal_pgm_codec",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(least(greatest(floor((CAST(x AS DOUBLE) + 1.0) * 127.5 + 0.5),
                                   0), 255) AS BIGINT)) AS pix
      FROM embeddings
    )
    SELECT vec_id                                    AS asset_id,
           CAST(8 AS BIGINT)                         AS width,
           CAST(8 AS BIGINT)                         AS height,
           CAST(list_sum(pix) AS BIGINT)             AS sum_pix,
           round(CAST(list_sum(pix) AS DOUBLE) / 64, 6) AS mean_pix,
           CAST(list_min(pix) AS BIGINT)             AS min_pix,
           CAST(list_max(pix) AS BIGINT)             AS max_pix
    FROM q
    """,
)
def multimodal_pgm_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: embeddings quantize to 8-bit grayscale
    (floor((x+1)·127.5 + 0.5), clipped), encode as binary PGM (P5) with a
    textual netpbm header, and decode through the REAL whitespace-and-
    comment-tolerant header parser (functions/multimodal.parse_pgm) —
    width/height in the output come from the PARSED header. Companion of
    multimodal_wav_codec on the image side; same full-value-oracle
    discipline (integer pixel sums recomputed by DuckDB from embeddings
    certify the byte layout end to end)."""
    import numpy as np
    import pandas as pd

    from ..catalog import load_table as t
    from ..functions.multimodal import encode_pgm, parse_pgm

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "width", "height", "sum_pix", "mean_pix",
                "min_pix", "max_pix")}
            for vid, e in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(e, dtype=np.float64)
                pix = np.clip(np.floor((x + 1.0) * 127.5 + 0.5), 0, 255).astype(
                    np.uint8
                ).reshape(8, 8)
                img = parse_pgm(encode_pgm(pix))
                s = img.astype(np.int64)
                out["asset_id"].append(int(vid))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["sum_pix"].append(int(s.sum()))
                out["mean_pix"].append(round(float(s.sum()) / s.size, 6))
                out["min_pix"].append(int(s.min()))
                out["max_pix"].append(int(s.max()))
            yield pd.DataFrame(out)

    return emb.mapInPandas(
        run,
        schema="asset_id bigint, width bigint, height bigint, sum_pix bigint,"
        " mean_pix double, min_pix bigint, max_pix bigint",
    )


@query(
    "pipe_clean_pgm_image",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(least(greatest(floor((CAST(x AS DOUBLE) + 1.0) * 127.5 + 0.5),
                                   0), 255) AS BIGINT)) AS pix
      FROM embeddings
    ), cells AS (
      SELECT vec_id, pix, i, pix[i + 1] AS p,
             greatest(
               CASE WHEN i % 8 > 0  THEN pix[i]     ELSE 0 END,
               CASE WHEN i % 8 < 7  THEN pix[i + 2] ELSE 0 END,
               CASE WHEN i >= 8     THEN pix[i - 7] ELSE 0 END,
               CASE WHEN i < 56     THEN pix[i + 9] ELSE 0 END
             ) AS nbr_max
      FROM q, range(0, 64) t(i)
    )
    SELECT vec_id AS asset_id,
           CAST(sum(CASE WHEN p > 160 THEN 1 ELSE 0 END) AS BIGINT) AS n_picture,
           CAST(sum(CASE WHEN p > 160 OR (p > 130 AND nbr_max > 160)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN p > 160 OR (p > 130 AND nbr_max > 160)
                         THEN p ELSE 0 END) AS BIGINT) AS kept_sum
    FROM cells
    GROUP BY vec_id
    """,
)
def pipe_clean_pgm_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's actual business — two-threshold tailcut cleaning of
    an INSTRUMENT IMAGE — on a REAL image format end to end: embeddings
    quantize to 8-bit 8×8 grayscale, encode as binary PGM, decode through
    the real netpbm parser, and the 2D tailcut runs on the decoded grid
    (picture threshold 160; boundary pixels >130 survive only when
    4-adjacent to a picture pixel — the genuine two-level neighborhood
    rule, not the 1D vector analogue pipe_clean_threshold uses). All
    comparisons are exact integers, so the per-asset kept-pixel counts
    and energies carry a full value oracle: DuckDB replays quantization
    + the neighbor rule straight from embeddings, certifying codec bytes
    AND cleaning semantics in one hash. Composes batch-BI's codec with
    the §2-M pipeline lane — the closest this environment permits to the
    reference's FITS→tailcut path, now with a real container format."""
    import numpy as np
    import pandas as pd

    from ..catalog import load_table as t
    from ..functions.multimodal import encode_pgm, parse_pgm

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "n_picture", "n_kept", "kept_sum")}
            for vid, e in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(e, dtype=np.float64)
                pix = np.clip(np.floor((x + 1.0) * 127.5 + 0.5), 0, 255).astype(
                    np.uint8
                ).reshape(8, 8)
                img = parse_pgm(encode_pgm(pix)).astype(np.int64)
                pic = img > 160
                nbr_pic = np.zeros_like(pic)
                nbr_pic[:, 1:] |= pic[:, :-1]
                nbr_pic[:, :-1] |= pic[:, 1:]
                nbr_pic[1:, :] |= pic[:-1, :]
                nbr_pic[:-1, :] |= pic[1:, :]
                keep = pic | ((img > 130) & nbr_pic)
                out["asset_id"].append(int(vid))
                out["n_picture"].append(int(pic.sum()))
                out["n_kept"].append(int(keep.sum()))
                out["kept_sum"].append(int(img[keep].sum()))
            yield pd.DataFrame(out)

    return emb.mapInPandas(
        run,
        schema="asset_id bigint, n_picture bigint, n_kept bigint, kept_sum bigint",
    )


@query(
    "multimodal_bmp_codec",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 1, 60), x ->
               CAST(least(greatest(floor((CAST(x AS DOUBLE) + 1.0) * 127.5 + 0.5),
                                   0), 255) AS BIGINT)) AS pix
      FROM embeddings
    )
    SELECT vec_id                                        AS asset_id,
           CAST(5 AS BIGINT)                             AS width,
           CAST(12 AS BIGINT)                            AS height,
           CAST(list_sum(pix) AS BIGINT)                 AS sum_pix,
           CAST(list_sum(list_slice(pix, 1, 5)) AS BIGINT)   AS top_row_sum,
           CAST(list_sum(list_slice(pix, 56, 60)) AS BIGINT) AS bottom_row_sum,
           CAST(list_min(pix) AS BIGINT)                 AS min_pix,
           CAST(list_max(pix) AS BIGINT)                 AS max_pix
    FROM q
    """,
)
def multimodal_bmp_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Windows-BMP codec end-to-end, completing the uncompressed-
    format set (PGM gray, WAV audio, now BMP color): the first 60
    embedding dims quantize to a 12×5 grayscale image, encode as 24-bit
    BI_RGB BMP (little-endian headers, BGR triplets, BOTTOM-UP row
    order, rows zero-padded to 4 bytes — 5·3=15 → 16, so the padding
    path is actually exercised), and decode through the REAL header-
    validating parser (functions/multimodal.encode_bmp24/parse_bmp24).
    top_row_sum/bottom_row_sum come from the PARSED image, so a parser
    that ignored bottom-up storage or mis-stepped the padded stride
    would hash-mismatch — DuckDB recomputes every feature straight from
    the embeddings. Arrow-batched mapInPandas; at 100 TB this is the
    debug-visualization export path (one tiny artifact per asset,
    embarrassingly parallel)."""
    import numpy as np
    import pandas as pd

    from ..catalog import load_table as t
    from ..functions.multimodal import encode_bmp24, parse_bmp24

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "width", "height", "sum_pix", "top_row_sum",
                "bottom_row_sum", "min_pix", "max_pix")}
            for vid, e in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(e, dtype=np.float64)[:60]
                pix = np.clip(np.floor((x + 1.0) * 127.5 + 0.5), 0, 255).astype(
                    np.uint8
                ).reshape(12, 5)
                img = parse_bmp24(encode_bmp24(pix))
                s = img.astype(np.int64)
                out["asset_id"].append(int(vid))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["sum_pix"].append(int(s.sum()))
                out["top_row_sum"].append(int(s[0].sum()))
                out["bottom_row_sum"].append(int(s[-1].sum()))
                out["min_pix"].append(int(s.min()))
                out["max_pix"].append(int(s.max()))
            yield pd.DataFrame(out)

    return emb.mapInPandas(
        run,
        schema="asset_id bigint, width bigint, height bigint, sum_pix bigint,"
        " top_row_sum bigint, bottom_row_sum bigint, min_pix bigint,"
        " max_pix bigint",
    )
