"""Round-9 pins — Puffin container + Iceberg v3 deletion-vector-v1 wire
format, and the DV delete round-trip invariants the identity oracle
can't see (time travel, no-rewrite, merge-into-newest-blob)."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from sap_cta_data_pipeline_spark.functions.puffin import (
    DELETION_VECTOR_V1,
    DV_V1_MAGIC,
    PUFFIN_MAGIC,
    deserialize_dv_blob,
    read_blob,
    read_puffin_footer,
    serialize_dv_blob,
    write_puffin,
)


def test_dv_blob_wire_format_and_roundtrip():
    positions = [0, 1, 5, 70000, (3 << 32) | 9]
    blob = serialize_dv_blob(positions)
    (n,) = struct.unpack_from(">i", blob, 0)
    assert blob[4:8] == DV_V1_MAGIC == bytes.fromhex("d1d33398")
    assert len(blob) == 4 + n + 4
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    assert crc == zlib.crc32(blob[4 : 4 + n]) & 0xFFFFFFFF
    assert deserialize_dv_blob(blob) == sorted(positions)


def test_dv_blob_corruption_raises():
    blob = bytearray(serialize_dv_blob([1, 2, 3]))
    blob[10] ^= 0xFF  # flip a bitmap byte -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        deserialize_dv_blob(bytes(blob))
    bad_magic = bytearray(serialize_dv_blob([1]))
    bad_magic[4] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        deserialize_dv_blob(bytes(bad_magic))
    with pytest.raises(ValueError, match="truncated|short"):
        deserialize_dv_blob(serialize_dv_blob([1, 2, 3])[:-6])


def test_puffin_container_layout(tmp_path):
    path = str(tmp_path / "t.puffin")
    b1 = serialize_dv_blob([1, 2])
    b2 = serialize_dv_blob([7])
    metas = write_puffin(
        path,
        [
            {"type": DELETION_VECTOR_V1, "payload": b1, "properties": {"k": "v"}},
            {"type": DELETION_VECTOR_V1, "payload": b2},
        ],
    )
    raw = open(path, "rb").read()
    assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC
    # blob payloads sit exactly at the recorded offsets
    assert raw[metas[0]["offset"] : metas[0]["offset"] + metas[0]["length"]] == b1
    assert raw[metas[1]["offset"] : metas[1]["offset"] + metas[1]["length"]] == b2
    assert metas[0]["offset"] == 4 and metas[1]["offset"] == 4 + len(b1)
    # footer payload size is little-endian at end-12
    (psize,) = struct.unpack_from("<i", raw, len(raw) - 12)
    payload = json.loads(raw[len(raw) - 12 - psize : len(raw) - 12])
    assert [b["type"] for b in payload["blobs"]] == [DELETION_VECTOR_V1] * 2
    # footer parse and manifest-addressed read agree
    footer = read_puffin_footer(path)
    assert footer == payload
    assert read_blob(path, metas[1]["offset"], metas[1]["length"]) == b2
    assert deserialize_dv_blob(b2) == [7]


def test_puffin_compressed_footer_refused(tmp_path):
    path = str(tmp_path / "c.puffin")
    write_puffin(path, [{"type": DELETION_VECTOR_V1, "payload": serialize_dv_blob([1])}])
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) - 8] |= 0x01  # set flags bit 0: compressed footer
    open(path, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="LZ4-compressed"):
        read_puffin_footer(path)


def test_iceberg_dv_delete_invariants(spark, sf_dir, tmp_path):
    from sap_cta_data_pipeline_spark.catalog import load_table
    from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
        iceberg_append,
        iceberg_delete_dv,
        iceberg_snapshot,
        iceberg_state,
    )

    base = str(tmp_path / "ib_dv")
    n = load_table(spark, sf_dir, "nation")
    iceberg_append(spark, base, n.filter("n_nationkey < 12"), "a0.parquet")
    iceberg_append(spark, base, n.filter("n_nationkey >= 12"), "a1.parquet")
    _, data0, _, _ = iceberg_state(base)
    pre_snap_keys = {
        r.n_nationkey for r in iceberg_snapshot(spark, base).collect()
    }
    iceberg_delete_dv(spark, base, "n_nationkey % 3 = 0")
    _, data1, pos1, _ = iceberg_state(base)
    assert [d["path"] for d in data1] == [d["path"] for d in data0], (
        "DV delete must not rewrite data files"
    )
    dvs1 = [d for d in pos1 if d.get("format") == "puffin"]
    assert len(dvs1) == 2, "one DV per touched data file"
    keys1 = {r.n_nationkey for r in iceberg_snapshot(spark, base).collect()}
    assert keys1 == {k for k in pre_snap_keys if k % 3 != 0}

    # second delete on a file already carrying a DV: newest blob is
    # self-contained (old ∪ new positions for that file)
    iceberg_delete_dv(spark, base, "n_nationkey = 7")
    _, _, pos2, _ = iceberg_state(base)
    dvs2 = [d for d in pos2 if d.get("format") == "puffin"]
    assert len(dvs2) == 3
    from sap_cta_data_pipeline_spark.functions.puffin import (
        deserialize_dv_blob as _dec,
        read_blob as _rb,
    )

    newest = max(dvs2, key=lambda d: d["seq"])
    merged = _dec(_rb(newest["path"], newest["offset"], newest["size"]))
    assert len(merged) >= 2, "newest DV carries old ∪ new positions"
    keys2 = {r.n_nationkey for r in iceberg_snapshot(spark, base).collect()}
    assert keys2 == {k for k in pre_snap_keys if k % 3 != 0 and k != 7}

    # time travel to the pre-delete snapshot still answers the full table
    import json as _json

    meta = _json.load(
        open(
            os.path.join(
                base,
                "metadata",
                f"v{max(int(f[1:-14]) for f in os.listdir(os.path.join(base, 'metadata')) if f.endswith('.metadata.json'))}.metadata.json",
            )
        )
    )
    first_sid = min(s["snapshot-id"] for s in meta["snapshots"])
    tt = {
        r.n_nationkey
        for r in iceberg_snapshot(spark, base, snapshot_id=first_sid).collect()
    }
    assert tt == {k for k in pre_snap_keys if k < 12}

    # idempotent no-op: re-deleting already-deleted rows commits nothing
    v_before = max(
        int(f[1:-14])
        for f in os.listdir(os.path.join(base, "metadata"))
        if f.endswith(".metadata.json")
    )
    assert iceberg_delete_dv(spark, base, "n_nationkey % 3 = 0") == v_before
