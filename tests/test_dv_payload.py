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
