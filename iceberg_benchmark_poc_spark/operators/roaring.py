"""Roaring bitmap wire format: portable serialization of uint32 position sets.

The reference stores delete positions as Roaring bitmaps inside zlib'd
"Puffin" blobs (poc/utils/mdv_generator.py:37-72: ``BitMap.serialize`` ->
header -> zlib). Round 1 shipped a delta+varint stand-in because pyroaring
isn't available here; this module implements the actual *portable* Roaring
serialization format (public spec: RoaringBitmap/RoaringFormatSpec, the
format ``BitMap.serialize`` emits), so blobs written by this engine are
bit-compatible with any Roaring implementation that has no run containers.

Layout (no run containers):
  uint32  cookie = 12346 (SERIAL_COOKIE_NO_RUNCONTAINER)
  uint32  n_containers
  n x (uint16 key, uint16 cardinality-1)     -- descriptive header
  n x uint32 offset                           -- container byte offsets
  n x container bytes:
      cardinality <= 4096: sorted uint16 array (2 bytes per value)
      cardinality  > 4096: 8 KiB bitset (1024 uint64 words)

Everything is little-endian. numpy does the per-container pack/unpack, so
encode/decode of a large position set is vectorized, not per-value Python.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
ARRAY_MAX = 4096  # cardinality threshold: array container vs bitmap container
BITMAP_BYTES = 8192


def roaring_serialize(positions, assume_normalized: bool = False) -> bytes:
    """Serialize an iterable of uint32 ints to portable Roaring bytes.

    ndarray input is vectorized end-to-end (np.unique sorts + dedups);
    arbitrary iterables are converted first. No per-value Python loop —
    at 8K positions/row the loop was the encode hot path, not the packing.
    ``assume_normalized`` skips the sort+dedup for callers that already
    hold a unique-sorted int64 ndarray (the MDV2 framing encoder) so each
    row is normalized exactly once.
    """
    if assume_normalized and isinstance(positions, np.ndarray):
        arr = positions.astype(np.int64, copy=False)
    elif isinstance(positions, np.ndarray):
        arr = np.unique(positions.astype(np.int64, copy=False))
    else:
        arr = np.unique(np.fromiter((int(p) for p in positions), dtype=np.int64))
    if arr.size and (int(arr[0]) < 0 or int(arr[-1]) >> 32):
        raise ValueError("roaring positions must fit in uint32")
    arr = arr.astype(np.uint32)
    keys = (arr >> np.uint32(16)).astype(np.uint16)
    lows = (arr & np.uint32(0xFFFF)).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [arr.size]

    header = bytearray()
    header += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, len(uniq_keys))
    containers: list[bytes] = []
    for ci, key in enumerate(uniq_keys):
        vals = lows[bounds[ci] : bounds[ci + 1]]
        card = vals.size
        header += struct.pack("<HH", int(key), card - 1)
        if card <= ARRAY_MAX:
            containers.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(BITMAP_BYTES // 8, dtype="<u8")
            idx = vals.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> np.uint32(6), np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64))
            containers.append(bits.tobytes())

    # offset header: absolute byte position of each container in the stream
    offset_base = len(header) + 4 * len(uniq_keys)
    offsets = bytearray()
    pos = offset_base
    for c in containers:
        offsets += struct.pack("<I", pos)
        pos += len(c)
    return bytes(header) + bytes(offsets) + b"".join(containers)


def roaring_deserialize_np(blob: bytes) -> "np.ndarray":
    """Parse portable Roaring bytes back to a sorted int64 ndarray."""
    cookie, n = struct.unpack_from("<II", blob, 0)
    if cookie != SERIAL_COOKIE_NO_RUNCONTAINER:
        raise ValueError(f"unsupported roaring cookie {cookie} (run containers not written here)")
    desc = np.frombuffer(blob, dtype="<u2", count=2 * n, offset=8).reshape(n, 2)
    offsets = np.frombuffer(blob, dtype="<u4", count=n, offset=8 + 4 * n)
    out: list[np.ndarray] = []
    for ci in range(n):
        key = np.uint32(desc[ci, 0]) << np.uint32(16)
        card = int(desc[ci, 1]) + 1
        off = int(offsets[ci])
        if card <= ARRAY_MAX:
            lows = np.frombuffer(blob, dtype="<u2", count=card, offset=off).astype(np.uint32)
        else:
            bits = np.frombuffer(blob, dtype="<u8", count=BITMAP_BYTES // 8, offset=off)
            lows = np.flatnonzero(np.unpackbits(bits.view(np.uint8), bitorder="little")).astype(np.uint32)
        out.append(key | lows)
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out).astype(np.int64)


def roaring_deserialize(blob: bytes) -> list[int]:
    """Parse portable Roaring bytes back to a sorted list of ints."""
    return roaring_deserialize_np(blob).tolist()
