"""Multimodal binary-column plumbing tests: schemas, Arrow round-trips,
mapInPandas stage shapes, and the stubbed codec boundary."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sap_cta_data_pipeline_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    df = mm.synthesize_media(spark, sf_dir)
    df.cache().count()
    return df


def test_media_schema_and_payloads(media):
    assert media.schema == mm.MEDIA_SCHEMA
    row = media.filter("asset_id = 0").collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == 64 * 4  # 64 float32s
    assert row.media_type in ("image", "audio", "video")


def test_feature_extraction_decodes_payload(spark, sf_dir, media):
    feats = mm.extract_features(media)
    assert feats.schema == mm.FEATURE_SCHEMA
    pdf = feats.toPandas().set_index("asset_id")
    # cross-check one asset against a local decode of the same embedding
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .collect()[0]
        .embedding
    )
    expected = np.frombuffer(struct.pack("<64f", *emb), dtype="<f4").astype(float)
    assert pdf.loc[0, "n_bytes"] == 256
    assert pdf.loc[0, "sample_mean"] == pytest.approx(round(float(expected.mean()), 6))
    assert pdf.loc[0, "sample_std"] == pytest.approx(round(float(expected.std()), 6))


def test_resize_rewrites_payload_and_meta(media):
    resized = mm.resize_image(media, 4, 4)
    img = resized.filter("media_type = 'image'").limit(1).collect()[0]
    assert img.meta.width == 4 and img.meta.height == 4
    assert len(img.payload) == 4 * 4 * 4  # 4x4 float32
    aud = resized.filter("media_type = 'audio'").limit(1).collect()[0]
    assert len(aud.payload) == 256  # non-images untouched


def test_frame_sampling_explodes_videos(media):
    frames = mm.sample_frames(media, every_n=2)
    assert frames.schema == mm.FRAME_SCHEMA
    pdf = frames.toPandas()
    n_videos = media.filter("media_type = 'video'").count()
    assert len(pdf) == n_videos * 2  # 4 frames, every 2nd → 2 rows per video
    assert set(pdf["frame_idx"]) == {0, 2}
    assert all(len(p) == 64 for p in pdf["frame_payload"])  # 16 float32s per frame


def test_unknown_codec_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="jpeg"):
        mm._decode_payload(b"\xff\xd8\xff", "jpeg")


def test_feature_report_rolls_up(spark, sf_dir):
    pdf = mm.media_feature_report(spark, sf_dir).toPandas()
    assert set(pdf["media_type"]) == {"image", "audio", "video"}
    assert (pdf["n_assets"] > 0).all()
    assert (pdf["avg_bytes"] == 256.0).all()


def test_wav_parser_is_a_real_parser():
    """The WAV decoder must walk chunks, validate magic/fmt, and honor
    word alignment — not just slice a fixed offset."""
    import numpy as np
    import pytest as _pytest
    import struct

    from sap_cta_data_pipeline_spark.functions.multimodal import (
        encode_wav_pcm16,
        parse_wav_pcm16,
    )

    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    rate, back = parse_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert rate == 44100 and (back == s).all()

    # extra chunk with ODD size before data: alignment must be honored
    payload = encode_wav_pcm16(s, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, back2 = parse_wav_pcm16(patched)
    assert rate2 == 8000 and (back2 == s).all()

    with _pytest.raises(ValueError):
        parse_wav_pcm16(b"not a wav")
    # stereo is outside the PCM-mono contract
    stereo = bytearray(encode_wav_pcm16(s, 8000))
    stereo[22] = 2  # n_channels
    with _pytest.raises(NotImplementedError):
        parse_wav_pcm16(bytes(stereo))


def test_pgm_parser_handles_comments():
    import numpy as np
    import pytest as _pytest

    from sap_cta_data_pipeline_spark.functions.multimodal import (
        encode_pgm,
        parse_pgm,
    )

    img = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    assert (parse_pgm(encode_pgm(img)) == img).all()
    # netpbm comments between header fields must be skipped
    commented = b"P5\n# a comment\n4 3\n# another\n255\n" + img.tobytes()
    assert (parse_pgm(commented) == img).all()
    with _pytest.raises(ValueError):
        parse_pgm(b"P6\n1 1\n255\n\x00")
