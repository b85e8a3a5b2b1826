"""Delta Lake deletion-vector codec — public wire format, stdlib-only.

Implements, from the published specs and nothing else:

- **Z85** (ZeroMQ spec 32/Z85): 4 bytes → 5 chars over an 85-symbol
  alphabet, big-endian. Delta uses it twice: to encode the 16-byte DV
  file UUID into the descriptor's ``pathOrInlineDv`` (20 chars), and to
  inline whole serialized bitmaps (``storageType: "i"``). Delta's codec
  zero-pads input to a multiple of 4 and relies on the descriptor's
  ``sizeInBytes`` to truncate on decode — mirrored here.
- **RoaringBitmapArray "portable" serialization** (Delta PROTOCOL.md §
  Deletion Vector Format + the RoaringFormatSpec): a 4-byte LE magic
  ``1681511377``, then the 64-bit portable layout — u64 LE bitmap count,
  then per bitmap a u32 LE key (high 32 bits) followed by the standard
  32-bit roaring portable serialization (array / bitset / run
  containers, descriptive + offset headers, cookies 12346/12347).
- **DV file layout** (``storageType: "u"`` / ``"p"``): a 1-byte format
  version (1), then per DV at ``offset``: u32 BE size, the serialized
  bitmap bytes, u32 BE CRC-32 of those bytes. Path for ``"u"``:
  ``<table>/<prefix>/deletion_vector_<uuid>.bin`` where the descriptor
  carries ``<prefix><z85(uuid)>`` (the final 20 chars are the UUID).

The decoder handles all three 32-bit container kinds; the encoder emits
array or bitset containers (run-length encoding is an optional writer
optimization in the spec — readers must accept all three, and tests
exercise the run decoder against hand-built bytes).

Scale note: a DV is metadata — its serialized size is bounded by the add
action's ``sizeInBytes`` (KBs/file; the bitmap for a whole 1M-row file is
≤128 KB as a bitset). Decoding is driver/metadata work by design; the
APPLY (anti-join on file × row_index) is the distributed half and lives
in ``operators/delta_reader.py``.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# ----------------------------------------------------------------- Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data``, zero-padding to a 4-byte multiple (Delta's
    Base85Codec behavior — the true byte length travels out-of-band in
    the descriptor's ``sizeInBytes``)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    """Decode Z85 text; ``length`` truncates the zero-padded tail."""
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i+5]!r} overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out[:length] if length is not None else out)


# ------------------------------------------- 32-bit roaring containers

_SERIAL_COOKIE = 12347  # has run containers
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above which a bitset container is used


def _serialize_rb32(values: list[int]) -> bytes:
    """Standard 32-bit roaring portable serialization of sorted distinct
    ``values`` (array/bitset containers; cookie 12346)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present with the no-run cookie)
    header_len = len(out) + 4 * len(keys)
    offsets, pos = [], header_len
    bodies = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        offsets.append(pos)
        bodies.append(body)
        pos += len(body)
    out += struct.pack(f"<{len(keys)}I", *offsets)
    for b in bodies:
        out += b
    return bytes(out)


def _deserialize_rb32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap starting at ``base``; returns
    (values, bytes_consumed). Handles array, bitset, and run containers
    and both cookies."""
    (cookie,) = struct.unpack_from("<I", buf, base)
    pos = base + 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"invalid roaring cookie {cookie} at offset {base}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential decode ignores them
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        hi = key << 16
        is_run = bool(run_flags and (run_flags[i >> 3] & (1 << (i & 7))))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + length_m1 + 1))
        elif card > _ARRAY_MAX:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    values.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    byte ^= low
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | v for v in vals)
    return values, pos - base


# --------------------------------------- RoaringBitmapArray (64-bit)

_MAGIC = 1681511377


def serialize_portable64(positions: list[int]) -> bytes:
    """The bare 64-bit portable RoaringBitmapArray layout (u64 LE bitmap
    count, then per bitmap u32 LE high-key + 32-bit portable roaring) —
    the format BOTH Delta (magic-prefixed, below) and Iceberg v3
    deletion vectors (puffin `deletion-vector-v1` blobs,
    functions/puffin.py) serialize row positions with."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("row positions must be non-negative")
    by_hi: dict[int, list[int]] = {}
    for p in positions:
        by_hi.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_hi)))
    for hi in sorted(by_hi):
        out += struct.pack("<I", hi)
        out += _serialize_rb32(by_hi[hi])
    return bytes(out)


def deserialize_portable64(data: bytes, offset: int = 0) -> list[int]:
    """Decode the bare 64-bit portable RoaringBitmapArray layout."""
    if len(data) - offset < 8:
        raise ValueError(f"portable bitmap too short ({len(data) - offset} bytes)")
    (n_bitmaps,) = struct.unpack_from("<q", data, offset)
    pos = offset + 8
    values: list[int] = []
    for _ in range(n_bitmaps):
        (hi,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, used = _deserialize_rb32(data, pos)
        pos += used
        values.extend((hi << 32) | v for v in lows)
    return sorted(values)


def serialize_bitmap(positions: list[int]) -> bytes:
    """Serialize sorted-able int64 row positions as Delta's magic-prefixed
    portable RoaringBitmapArray."""
    return struct.pack("<I", _MAGIC) + serialize_portable64(positions)


def deserialize_bitmap(data: bytes) -> list[int]:
    """Decode a magic-prefixed portable RoaringBitmapArray → sorted
    int64 positions."""
    if len(data) < 12:
        raise ValueError(f"DV bitmap too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad DV magic {magic} (expected {_MAGIC})")
    return deserialize_portable64(data, offset=4)


# ----------------------------------------------------- DV file + paths

_DV_FORMAT_VERSION = 1


def dv_file_name(uid: _uuid.UUID) -> str:
    return f"deletion_vector_{uid}.bin"


def dv_relative_path(descriptor: dict) -> str:
    """Resolve a ``storageType: "u"`` descriptor's file path relative to
    the table root: the LAST 20 chars of ``pathOrInlineDv`` are the
    z85-encoded 16-byte UUID; anything before them is a directory
    prefix (writers shard DV files across prefixes at scale)."""
    enc = descriptor["pathOrInlineDv"]
    prefix, uuid_part = enc[:-20], enc[-20:]
    uid = _uuid.UUID(bytes=z85_decode(uuid_part, length=16))
    name = dv_file_name(uid)
    return os.path.join(prefix, name) if prefix else name


def write_dv_file(
    path: str, bitmaps: list[bytes]
) -> list[tuple[int, int]]:
    """Write serialized bitmaps into one DV file; returns per-bitmap
    (offset, sizeInBytes) for the descriptors. Layout per the spec:
    version byte, then [u32 BE size][data][u32 BE crc32(data)] per DV."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    spans = []
    with open(path, "wb") as fh:
        fh.write(bytes([_DV_FORMAT_VERSION]))
        pos = 1
        for data in bitmaps:
            spans.append((pos, len(data)))
            fh.write(struct.pack(">I", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return spans


def dv_deleted_positions(table_base: str, descriptor: dict) -> list[int]:
    """Decode a deletionVector descriptor (any storageType) into the
    sorted int64 row positions it marks deleted; verifies size, CRC, and
    the descriptor's declared cardinality."""
    st = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"], length=size)
    elif st in ("u", "p"):
        if st == "u":
            fpath = os.path.join(table_base, dv_relative_path(descriptor))
        else:  # absolute path
            fpath = descriptor["pathOrInlineDv"]
        with open(fpath, "rb") as fh:
            raw = fh.read()
        if not raw or raw[0] != _DV_FORMAT_VERSION:
            raise ValueError(
                f"unsupported DV file format version {raw[:1]!r} in {fpath}"
            )
        off = int(descriptor["offset"])
        (stored_size,) = struct.unpack_from(">I", raw, off)
        if stored_size != size:
            raise ValueError(
                f"DV size mismatch in {fpath}@{off}: file says {stored_size}, "
                f"descriptor says {size}"
            )
        data = raw[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError(f"DV checksum mismatch in {fpath}@{off}")
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    positions = deserialize_bitmap(data)
    card = int(descriptor["cardinality"])
    if len(positions) != card:
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap has "
            f"{len(positions)}"
        )
    return positions


def make_dv_descriptor_inline(positions: list[int]) -> dict:
    data = serialize_bitmap(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }


def make_dv_descriptor_file(
    table_base: str, positions: list[int], prefix: str = ""
) -> dict:
    """Serialize ``positions``, write a sidecar DV file under
    ``table_base`` (optionally sharded under ``prefix``), and return the
    ``storageType: "u"`` descriptor naming it."""
    uid = _uuid.uuid4()
    data = serialize_bitmap(positions)
    rel = os.path.join(prefix, dv_file_name(uid)) if prefix else dv_file_name(uid)
    spans = write_dv_file(os.path.join(table_base, rel), [data])
    offset, size = spans[0]
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(uid.bytes),
        "offset": offset,
        "sizeInBytes": size,
        "cardinality": len(set(positions)),
    }
