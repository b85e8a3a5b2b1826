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
