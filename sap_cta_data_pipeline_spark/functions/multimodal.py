"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow batch shape,
mapInPandas stage signatures, partitioning. The codec layer is STUBBED —
this container has no image/audio libraries — behind `_decode_payload`:
real codecs (PIL/libsndfile/ffmpeg) would slot in there without touching
any Spark plumbing; asking for a real codec raises NotImplementedError.

The synthetic assets derive deterministically from the `embeddings` table:
an asset's payload is the float32 byte-packing of its embedding (a fake
"encoded" blob a decoder can actually parse), and media metadata follows
from the label. This keeps every stage verifiable end-to-end.

Scale design: payloads ride the DataFrame as binary cells → Arrow batches
into Python with `spark.sql.execution.arrow.maxRecordsPerBatch` bounding
batch memory (decoded media is much larger than encoded — size batches by
decoded footprint). Stages are mapInPandas (no shuffle); only explicit
repartition(asset_id) redistributes, e.g. to spread hot media partitions
before an expensive decode.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("sample_mean", T.DoubleType()),
        T.StructField("sample_std", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")
_STUB_CODECS = {"image": "raw-f32-8x8", "audio": "raw-f32-pcm", "video": "raw-f32-4f"}


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table from embeddings: payload = float32 bytes
    of the embedding; media_type = label mod 3; metadata per type (image
    8×8, audio 64 samples @8kHz, video 4 frames of 16 floats)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vec_id, emb, label in zip(pdf["vec_id"], pdf["embedding"], pdf["label"]):
                mt = _MEDIA_TYPES[int(label) % 3]
                payload = struct.pack("<64f", *[float(x) for x in emb])
                rows.append(
                    {
                        "asset_id": int(vec_id),
                        "media_type": mt,
                        "payload": payload,
                        "meta": {
                            "codec": _STUB_CODECS[mt],
                            "width": 8 if mt == "image" else 0,
                            "height": 8 if mt == "image" else 0,
                            "sample_rate": 8000 if mt == "audio" else 0,
                            "n_frames": 4 if mt == "video" else 1,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.mapInPandas(build, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes, codec: str) -> np.ndarray:
    """Codec dispatch. Round 4: WAV/RIFF PCM16 and PGM P5 decode FOR REAL
    (header-walking parsers below, stdlib + numpy — no media library
    needed), alongside the raw-f32 synthetic codecs. The environment-
    bounded boundary is now only COMPRESSED formats (jpeg/png/flac/h264),
    which genuinely require PIL/libsndfile/ffmpeg."""
    if codec.startswith("raw-f32"):
        return np.frombuffer(payload, dtype="<f4").astype(np.float64)
    if codec == "wav-pcm16":
        _, samples = parse_wav_pcm16(payload)
        return samples.astype(np.float64)
    if codec == "pgm-p5":
        return parse_pgm(payload).astype(np.float64).ravel()
    raise NotImplementedError(
        f"codec {codec!r}: compressed-format decoders (PIL/soundfile/ffmpeg) "
        "are absent from this environment; wav-pcm16 / pgm-p5 / raw-f32 decode"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize each asset (bytes, checksum, sample moments) —
    one mapInPandas stage, no shuffle; Arrow batch size bounds peak
    decoded memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "media_type", "n_bytes", "crc32",
                                   "sample_mean", "sample_std")}
            for aid, mt, payload, meta in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                samples = _decode_payload(payload, meta["codec"])
                out["asset_id"].append(int(aid))
                out["media_type"].append(mt)
                out["n_bytes"].append(len(payload))
                out["crc32"].append(zlib.crc32(payload))
                out["sample_mean"].append(round(float(samples.mean()), 6))
                out["sample_std"].append(round(float(samples.std()), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize stub for image assets (nearest-neighbor index sampling on the
    decoded grid — deterministic, no interpolation library); non-images
    pass through untouched. Payload and meta are rewritten, schema kept."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mt, payload, meta in zip(pdf["media_type"], pdf["payload"], pdf["meta"]):
                if mt != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_payload(payload, meta["codec"]).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = img[np.ix_(ys, xs)].astype("<f4")
                payloads.append(resized.tobytes())
                new_meta = dict(meta)
                new_meta["width"], new_meta["height"] = out_w, out_h
                metas.append(new_meta)
            pdf = pdf.assign(payload=payloads, meta=metas)
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video assets: payload is n_frames equal-size
    frames; emit every n-th frame as its own row (one-to-many mapInPandas,
    the UDTF-shaped media stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame_payload": []}
            for aid, mt, payload, meta in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mt != "video":
                    continue
                n = int(meta["n_frames"]) or 1
                frame_size = len(payload) // n
                for i in range(0, n, every_n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        payload[i * frame_size : (i + 1) * frame_size]
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_feature_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: synthesize → decode/featurize →
    per-media-type rollup (count, avg bytes, avg sample mean)."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.avg("n_bytes").alias("avg_bytes"),
        F.round(F.avg("sample_mean"), 6).alias("avg_sample_mean"),
        F.round(F.avg("sample_std"), 6).alias("avg_sample_std"),
    )


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame decode + moments over sampled video frames — the second
    mapInPandas stage of the frame pipeline. Frame payloads are raw-f32
    slices by construction (sample_frames slices the raw-f32 video
    payload), so the stub codec boundary stays in _decode_payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "frame_idx", "n_bytes", "frame_mean")}
            for aid, idx, payload in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                samples = _decode_payload(payload, "raw-f32")
                out["asset_id"].append(int(aid))
                out["frame_idx"].append(int(idx))
                out["n_bytes"].append(len(payload))
                out["frame_mean"].append(round(float(samples.mean()), 6))
            yield pd.DataFrame(out)

    return frames.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs (round 4): WAV/RIFF PCM16 and PGM (P5) need no media library —
# stdlib struct + numpy decode them for real. This narrows the
# environment-bounded boundary in _decode_payload to COMPRESSED formats
# (jpeg/png/flac/h264), which genuinely require PIL/libsndfile/ffmpeg.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples_i16: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical RIFF/WAVE container: fmt chunk (PCM, mono, 16-bit)
    + data chunk. Byte-exact per the public WAVE spec."""
    data = samples_i16.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def parse_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walking WAV parser: validates RIFF/WAVE magic, walks chunks to
    fmt (must be PCM mono 16-bit) and data; returns (sample_rate, int16
    samples). Raises on anything non-PCM — the honest codec boundary."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (audio_fmt, n_ch, bits) != (1, 1, 16):
                raise NotImplementedError("only PCM mono 16-bit WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


def encode_pgm(img_u8: np.ndarray) -> bytes:
    """Binary PGM (P5), maxval 255 — the netpbm grayscale format."""
    h, w = img_u8.shape
    return f"P5\n{w} {h}\n255\n".encode() + img_u8.astype(np.uint8).tobytes()


def parse_pgm(payload: bytes) -> np.ndarray:
    """P5 parser with whitespace/comment-tolerant header scanning."""
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PGM supported")
    return np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8).reshape(h, w)


def encode_bmp24(img_u8: np.ndarray) -> bytes:
    """Windows BMP, BITMAPINFOHEADER, 24-bit BI_RGB, R=G=B=pixel.

    Real-format quirks implemented faithfully: little-endian headers,
    rows stored BOTTOM-UP, BGR byte order, each row zero-padded to a
    4-byte boundary."""
    import struct

    h, w = img_u8.shape
    row_raw = w * 3
    row_padded = (row_raw + 3) & ~3
    data_size = row_padded * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_padded - row_raw)
    for r in range(h - 1, -1, -1):  # bottom-up
        for p in img_u8[r]:
            v = int(p)
            body += bytes((v, v, v))  # BGR (equal channels here)
        body += pad
    return header + info + bytes(body)


def parse_bmp24(payload: bytes) -> np.ndarray:
    """Parse a 24-bit BI_RGB BMP back to a (h, w) grayscale array
    (blue channel; the encoder writes equal channels). Validates magic,
    header size, bit depth, and compression; honors bottom-up rows and
    4-byte row padding. Top-down files (negative height) are handled —
    both orientations are legal BMP."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    row_padded = (w * 3 + 3) & ~3
    img = np.empty((h, w), dtype=np.uint8)
    for i in range(h):
        r = (h - 1 - i) if bottom_up else i
        base = off + i * row_padded
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=base)
        img[r] = row[0::3]  # blue channel
    return img
