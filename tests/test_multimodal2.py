"""Batch FU pins — VAD segmentation closed forms on planted waveforms."""

from __future__ import annotations

import struct

import sap_cta_data_pipeline_spark.operators.multimodal_ops2 as m2
from sap_cta_data_pipeline_spark.operators.multimodal_ops2 import (
    multimodal_audio_vad_segments,
)


def _pcm(frames):
    """Pack 4 frames of 16 constant-amplitude f32 samples."""
    vals = []
    for a in frames:
        vals += [a] * 16
    return struct.pack("<64f", *vals)


def _plant(monkeypatch, spark, assets):
    rows = [(i, "audio", _pcm(fr)) for i, fr in enumerate(assets)]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    monkeypatch.setattr(m2, "synthesize_media", lambda s, sf: df)


def test_vad_two_segments(spark, monkeypatch):
    # frames [loud, quiet, loud, loud]: mean rms = (4+1+4+4)/4 = 3.25
    # active frames 0, 2, 3 -> segments (0, len 1) and (2, len 2)
    _plant(monkeypatch, spark, [[4.0, 1.0, 4.0, 4.0]])
    rows = sorted(
        multimodal_audio_vad_segments.__wrapped__(spark, "x").collect(),
        key=lambda r: r.segment_start_frame,
    )
    assert [(r.segment_start_frame, r.n_frames) for r in rows] == [(0, 1), (2, 2)]
    assert rows[0].sum_rms == 4.0
    assert rows[1].sum_rms == 8.0


def test_vad_constant_energy_no_segments(spark, monkeypatch):
    # nothing strictly exceeds the mean of a constant signal
    _plant(monkeypatch, spark, [[2.0, 2.0, 2.0, 2.0]])
    assert multimodal_audio_vad_segments.__wrapped__(spark, "x").count() == 0
