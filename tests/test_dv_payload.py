"""Codec properties: roundtrip exactness + the reference's compression finding
(contiguous runs compress far better than sparse positions —
reference poc/utils/mdv_generator.py:112-150, index.html Roaring validation)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from iceberg_benchmark_poc_spark.operators.dv_payload import decode_positions, encode_positions


@given(st.lists(st.integers(0, 10_000_000), max_size=500))
@settings(max_examples=200, deadline=None)
def test_roundtrip_exact(positions):
    assert decode_positions(encode_positions(positions)) == sorted(set(positions))


def test_empty_payload():
    assert decode_positions(encode_positions([])) == []


def test_run_compresses_better_than_sparse():
    run = encode_positions(list(range(5000, 5500)))  # contiguous partition-drop
    sparse = encode_positions(list(range(0, 500_000, 997)))  # scattered CDC deletes
    assert len(run) < len(sparse)
    # the reference's observation: a 500-delete run costs a few dozen bytes
    assert len(run) < 100
    # and sparse deletes cost ~1-2 bytes each after compression
    assert len(sparse) < 500 * 4


def test_corrupt_blob_rejected():
    import pytest

    blob = bytearray(encode_positions([1, 2, 3]))
    blob[0:4] = b"XXXX"
    with pytest.raises(ValueError):
        decode_positions(bytes(blob))


# --- Roaring wire format (operators/roaring.py, the MDV2 payload) ----------


from iceberg_benchmark_poc_spark.operators.dv_payload import (  # noqa: E402
    decode_positions_any,
    encode_positions_roaring,
)
from iceberg_benchmark_poc_spark.operators.roaring import (  # noqa: E402
    ARRAY_MAX,
    roaring_deserialize,
    roaring_serialize,
)


@given(st.lists(st.integers(0, 2**32 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_roaring_roundtrip_exact(positions):
    assert roaring_deserialize(roaring_serialize(positions)) == sorted(set(positions))


@given(st.lists(st.integers(0, 10_000_000), max_size=300))
@settings(max_examples=100, deadline=None)
def test_roaring_payload_matches_varint_payload(positions):
    """Both wire formats decode to the same set through the shared decoder."""
    want = sorted(set(positions))
    assert decode_positions_any(encode_positions(positions)) == want
    assert decode_positions_any(encode_positions_roaring(positions)) == want


def test_roaring_container_threshold():
    """<=4096 per chunk serializes as a 2-byte-per-value array container;
    >4096 flips to the fixed 8 KiB bitmap container (portable spec)."""
    arr = roaring_serialize(range(ARRAY_MAX))  # 4096 values, one chunk
    bmp = roaring_serialize(range(ARRAY_MAX + 1))  # 4097 -> bitmap
    header = 8 + 4 + 4  # cookie+count, desc, offset
    assert len(arr) == header + 2 * ARRAY_MAX
    assert len(bmp) == header + 8192


def test_roaring_multichunk():
    """Values spanning several 65536 chunks get one container per chunk."""
    vals = [1, 2, 65536 + 5, 3 * 65536 + 7, 2**32 - 1]
    blob = roaring_serialize(vals)
    assert roaring_deserialize(blob) == vals
    # 4 chunks: cookie+count (8) + 4*(desc 4 + offset 4) + array bytes
    assert len(blob) == 8 + 4 * 8 + 2 * len(vals)


def test_roaring_rejects_wide_values():
    import pytest

    with pytest.raises(ValueError):
        roaring_serialize([2**32])


def test_roaring_golden_bytes():
    """Pin the exact wire layout (hand-derived from the portable spec):
    cookie 12346 LE | n_containers | (key, card-1) pairs | absolute offsets |
    sorted uint16 little-endian values. Catches any accidental format drift
    that the roundtrip tests alone would miss."""
    assert roaring_serialize([1, 2, 3]).hex() == (
        "3a300000"  # SERIAL_COOKIE_NO_RUNCONTAINER = 12346
        "01000000"  # one container
        "0000" "0200"  # key 0, cardinality-1 = 2
        "10000000"  # container starts at byte 16
        "010002000300"  # values 1,2,3 as uint16 LE
    )
    assert roaring_serialize([0, 65536]).hex() == (
        "3a300000" "02000000"
        "0000" "0000"  # chunk 0, card 1
        "0100" "0000"  # chunk 1, card 1
        "18000000" "1a000000"  # offsets 24, 26
        "0000" "0000"  # low bits 0 in each chunk
    )


def test_roaring_rejects_unknown_cookie():
    import pytest

    with pytest.raises(ValueError, match="cookie"):
        roaring_deserialize(b"\x39\x30\x00\x00\x00\x00\x00\x00")  # 12345 = run cookie


def test_varint_five_byte_deltas():
    """Deltas >= 2^28 need the fifth varint byte — the widest lane of the
    vectorized (n,5) encode matrix, unreachable from the bounded-range
    hypothesis cases above."""
    from iceberg_benchmark_poc_spark.operators.dv_payload import (
        decode_positions,
        encode_positions,
    )

    positions = [0, 2**28, 2**31, 2**32 - 1]
    assert decode_positions(encode_positions(positions)) == positions
    # singleton at the top of the domain: first delta itself is 5 bytes
    assert decode_positions(encode_positions([2**32 - 1])) == [2**32 - 1]


def test_varint_dense_run_roundtrip():
    """A dense 0..n run (all deltas 1) exercises the single-byte fast lane
    at bulk size through the vectorized path."""
    from iceberg_benchmark_poc_spark.operators.dv_payload import (
        decode_positions,
        encode_positions,
    )

    run = list(range(20_000))
    assert decode_positions(encode_positions(run)) == run


def test_varint_rejects_out_of_domain():
    """Positions outside uint32 must fail loudly, never encode corrupted
    deletion vectors (the 5-byte varint matrix cannot carry wider deltas)."""
    import pytest

    from iceberg_benchmark_poc_spark.operators.dv_payload import encode_positions

    with pytest.raises(ValueError):
        encode_positions([2**35])
    with pytest.raises(ValueError):
        encode_positions([1, 2, 2**40])
    with pytest.raises(ValueError):
        encode_positions([-1])


def test_unterminated_varint_is_valueerror():
    """A truncated body (trailing continuation byte, no terminator) must
    raise the documented ValueError, not leak an IndexError."""
    import struct
    import zlib

    import pytest

    from iceberg_benchmark_poc_spark.operators.dv_payload import MAGIC, ZLIB_LEVEL, decode_positions

    body = zlib.compress(b"\x80\x80", ZLIB_LEVEL)  # two continuation bytes, no terminator
    blob = MAGIC + struct.pack("<IQ", 1, len(body)) + body
    with pytest.raises(ValueError):
        decode_positions(blob)
