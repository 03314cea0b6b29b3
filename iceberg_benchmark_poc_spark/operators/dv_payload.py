"""Delete-vector payload codec: position sets <-> compressed binary blobs.

The reference serializes delete positions as Roaring bitmaps + zlib "Puffin"
blobs (reference poc/utils/mdv_generator.py:37-72: BitMap.serialize ->
16-byte header -> zlib level 6). Two payload formats coexist here behind one
frame and a shared decoder:

- MDV1: delta+varint body — compact for sorted runs, dependency-free;
- MDV2: the reference's actual wire format — portable Roaring serialization
  (operators/roaring.py implements the public RoaringFormatSpec layout with
  array + bitmap containers) compressed with the same zlib level 6.

Spark-side the codec runs as Arrow-batched pandas UDFs over ARRAY<BIGINT>
position columns: encode/decode never leave the executor, and the blobs are
plain BinaryType columns any sink (Iceberg puffin files, parquet) can store.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, LongType

MAGIC = b"MDV1"
ZLIB_LEVEL = 6  # reference poc/utils/mdv_generator.py:62

#: max varint bytes per delta: positions are uint32, so deltas need <=5
#: 7-bit groups (ceil(32/7))
_VARINT_MAX = 5


def _unique_sorted(positions) -> np.ndarray:
    if isinstance(positions, np.ndarray):
        return np.unique(positions.astype(np.int64, copy=False))
    return np.unique(np.fromiter((int(p) for p in positions), dtype=np.int64))


def encode_positions(positions) -> bytes:
    """Sorted-delta varint encoding, zlib-compressed, 16-byte header.

    Vectorized: the (n, 5) matrix of 7-bit groups is built with numpy shifts
    and flattened through a per-delta byte-count mask — byte-identical to
    the per-value loop it replaced (golden-byte tested), ~30x faster at 8K
    positions/row because no Python executes per position.
    """
    pos = _unique_sorted(positions)
    if pos.size and (int(pos[0]) < 0 or int(pos[-1]) >> 32):
        # same uint32 domain as the roaring codec: the 5-byte varint matrix
        # cannot carry wider deltas, and out-of-domain input must fail
        # loudly, never encode corrupted deletion vectors
        raise ValueError("positions must fit in uint32")
    deltas = np.diff(pos, prepend=np.int64(0)).astype(np.uint64)
    n = deltas.size
    if n == 0:
        body = zlib.compress(b"", ZLIB_LEVEL)
        return MAGIC + struct.pack("<IQ", 0, len(body)) + body
    groups = np.empty((n, _VARINT_MAX), dtype=np.uint8)
    rem = deltas.copy()
    for i in range(_VARINT_MAX):
        groups[:, i] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
        groups[:, i] |= np.where(rem > 0, np.uint8(0x80), np.uint8(0))
    nbytes = (
        1
        + (deltas >= np.uint64(1 << 7)).astype(np.int64)
        + (deltas >= np.uint64(1 << 14)).astype(np.int64)
        + (deltas >= np.uint64(1 << 21)).astype(np.int64)
        + (deltas >= np.uint64(1 << 28)).astype(np.int64)
    )
    keep = np.arange(_VARINT_MAX) < nbytes[:, None]  # C-order flatten keeps per-delta byte order
    body = zlib.compress(groups[keep].tobytes(), ZLIB_LEVEL)
    header = MAGIC + struct.pack("<IQ", int(n), len(body))  # 16 bytes
    return header + body


def decode_positions_np(blob: bytes) -> np.ndarray:
    if blob[:4] != MAGIC:
        raise ValueError("not an MDV1 payload")
    count, body_len = struct.unpack("<IQ", blob[4:16])
    raw = np.frombuffer(zlib.decompress(blob[16 : 16 + body_len]), dtype=np.uint8)
    if raw.size == 0:
        if count != 0:
            raise ValueError(f"corrupt payload: 0 != {count}")
        return np.empty(0, dtype=np.int64)
    # vectorized varint: terminator bytes (high bit clear) end each delta;
    # reduceat sums the shifted 7-bit groups per delta (disjoint bit ranges,
    # uint64-exact), cumsum undoes the delta coding
    is_last = (raw & 0x80) == 0
    if not is_last[-1]:
        # trailing continuation byte with no terminator: truncated body.
        # Callers handle corrupt payloads as ValueError (not IndexError).
        raise ValueError("corrupt payload: unterminated varint")
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    group = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    ofs = (np.arange(raw.size, dtype=np.int64) - starts[group]).astype(np.uint64)
    vals = (raw & 0x7F).astype(np.uint64) << (np.uint64(7) * ofs)
    deltas = np.add.reduceat(vals, starts)
    positions = np.cumsum(deltas.astype(np.int64))
    if positions.size != count:
        raise ValueError(f"corrupt payload: {positions.size} != {count}")
    return positions


def decode_positions(blob: bytes) -> list[int]:
    return decode_positions_np(blob).tolist()


MAGIC_ROARING = b"MDV2"


def encode_positions_roaring(positions: list[int], run_optimize: bool = False) -> bytes:
    """Roaring-container payload: the reference's actual wire format.

    Mirrors poc/utils/mdv_generator.py:56-72 (BitMap.serialize -> header ->
    zlib level 6): the body is portable Roaring serialization (see
    operators/roaring.py), zlib-compressed, behind the same 16-byte frame as
    the MDV1 varint codec so both formats coexist in one BinaryType column.
    ``run_optimize=True`` matches the reference exactly — it calls
    ``run_optimize()`` on every bitmap before serializing
    (poc/utils/mdv_generator.py:134,164), so contiguous delete ranges
    collapse to run containers.
    """
    from .roaring import roaring_serialize

    pos = _unique_sorted(positions)
    body = zlib.compress(
        roaring_serialize(pos, assume_normalized=True, run_optimize=run_optimize), ZLIB_LEVEL
    )
    return MAGIC_ROARING + struct.pack("<IQ", int(pos.size), len(body)) + body


def decode_positions_any_np(blob: bytes) -> np.ndarray:
    """Decode either payload format by magic (MDV1 varint / MDV2 roaring)."""
    if blob[:4] == MAGIC_ROARING:
        from .roaring import roaring_deserialize_np

        count, body_len = struct.unpack("<IQ", blob[4:16])
        positions = roaring_deserialize_np(zlib.decompress(blob[16 : 16 + body_len]))
        if positions.size != count:
            raise ValueError(f"corrupt roaring payload: {positions.size} != {count}")
        return positions
    return decode_positions_np(blob)


def decode_positions_any(blob: bytes) -> list[int]:
    return decode_positions_any_np(blob).tolist()


@F.pandas_udf(BinaryType())
def encode_positions_udf(positions: pd.Series) -> pd.Series:
    # cells arrive as numpy arrays from Arrow — pass through, no list() copy
    return positions.map(encode_positions)


@F.pandas_udf(BinaryType())
def encode_positions_roaring_udf(positions: pd.Series) -> pd.Series:
    return positions.map(encode_positions_roaring)


@F.pandas_udf(BinaryType())
def encode_positions_roaring_runs_udf(positions: pd.Series) -> pd.Series:
    # the reference's actual write path: run_optimize() before serialize
    return positions.map(lambda p: encode_positions_roaring(p, run_optimize=True))


@F.pandas_udf(ArrayType(LongType()))
def decode_positions_udf(blobs: pd.Series) -> pd.Series:
    # ndarray cells go straight back through Arrow — no per-position
    # PyObject list materialization
    return blobs.map(lambda b: decode_positions_any_np(bytes(b)))
