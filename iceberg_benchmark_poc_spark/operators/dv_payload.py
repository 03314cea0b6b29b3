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

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, LongType

MAGIC = b"MDV1"
ZLIB_LEVEL = 6  # reference poc/utils/mdv_generator.py:62


def encode_positions(positions: list[int]) -> bytes:
    """Sorted-delta varint encoding, zlib-compressed, 16-byte header."""
    pos = sorted(set(int(p) for p in positions))
    out = bytearray()
    prev = 0
    for p in pos:
        delta = p - prev
        prev = p
        while True:
            b = delta & 0x7F
            delta >>= 7
            if delta:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    body = zlib.compress(bytes(out), ZLIB_LEVEL)
    header = MAGIC + struct.pack("<IQ", len(pos), len(body))  # 16 bytes
    return header + body


def decode_positions(blob: bytes) -> list[int]:
    if blob[:4] != MAGIC:
        raise ValueError("not an MDV1 payload")
    count, body_len = struct.unpack("<IQ", blob[4:16])
    raw = zlib.decompress(blob[16 : 16 + body_len])
    positions, acc, shift, prev = [], 0, 0, 0
    for byte in raw:
        acc |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            prev += acc
            positions.append(prev)
            acc, shift = 0, 0
    if len(positions) != count:
        raise ValueError(f"corrupt payload: {len(positions)} != {count}")
    return positions


MAGIC_ROARING = b"MDV2"


def encode_positions_roaring(positions: list[int]) -> bytes:
    """Roaring-container payload: the reference's actual wire format.

    Mirrors poc/utils/mdv_generator.py:56-72 (BitMap.serialize -> header ->
    zlib level 6): the body is portable Roaring serialization (see
    operators/roaring.py), zlib-compressed, behind the same 16-byte frame as
    the MDV1 varint codec so both formats coexist in one BinaryType column.
    """
    from .roaring import roaring_serialize

    pos = sorted(set(int(p) for p in positions))
    body = zlib.compress(roaring_serialize(pos), ZLIB_LEVEL)
    return MAGIC_ROARING + struct.pack("<IQ", len(pos), len(body)) + body


def decode_positions_any(blob: bytes) -> list[int]:
    """Decode either payload format by magic (MDV1 varint / MDV2 roaring)."""
    if blob[:4] == MAGIC_ROARING:
        from .roaring import roaring_deserialize

        count, body_len = struct.unpack("<IQ", blob[4:16])
        positions = roaring_deserialize(zlib.decompress(blob[16 : 16 + body_len]))
        if len(positions) != count:
            raise ValueError(f"corrupt roaring payload: {len(positions)} != {count}")
        return positions
    return decode_positions(blob)


@F.pandas_udf(BinaryType())
def encode_positions_udf(positions: pd.Series) -> pd.Series:
    return positions.map(lambda arr: encode_positions(list(arr)))


@F.pandas_udf(BinaryType())
def encode_positions_roaring_udf(positions: pd.Series) -> pd.Series:
    return positions.map(lambda arr: encode_positions_roaring(list(arr)))


@F.pandas_udf(ArrayType(LongType()))
def decode_positions_udf(blobs: pd.Series) -> pd.Series:
    return blobs.map(lambda b: decode_positions_any(bytes(b)))
