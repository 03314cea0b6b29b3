"""Delete-vector payload codec: position sets <-> compressed binary blobs.

The reference serializes delete positions as Roaring bitmaps + zlib "Puffin"
blobs (reference poc/utils/mdv_generator.py:37-72: BitMap.serialize ->
16-byte header -> zlib level 6). pyroaring is not available here, so the
container is a delta+varint encoding with the same zlib framing — functionally
equivalent for the property the reference measures (contiguous runs compress
to a few bytes; sparse positions cost ~1-2 bytes each), and deterministic.

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


@F.pandas_udf(BinaryType())
def encode_positions_udf(positions: pd.Series) -> pd.Series:
    return positions.map(lambda arr: encode_positions(list(arr)))


@F.pandas_udf(ArrayType(LongType()))
def decode_positions_udf(blobs: pd.Series) -> pd.Series:
    return blobs.map(lambda b: decode_positions(bytes(b)))
