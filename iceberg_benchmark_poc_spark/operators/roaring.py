"""Roaring bitmap wire format: portable serialization of uint32 position sets.

The reference stores delete positions as Roaring bitmaps inside zlib'd
"Puffin" blobs (poc/utils/mdv_generator.py:37-72: ``BitMap.serialize`` ->
header -> zlib) and calls ``run_optimize()`` on every bitmap before
serializing (poc/utils/mdv_generator.py:134,164), so real reference blobs use
run containers whenever deletes are contiguous — its headline ~9-bytes-for-
500-contiguous-deletes compression is a run-container result. This module
implements the *portable* Roaring serialization format from the public spec
(RoaringBitmap/RoaringFormatSpec) for all three container kinds, so blobs
written by this engine are bit-compatible with pyroaring / Java Roaring /
CRoaring, and blobs from those writers (run-optimized or not) decode here.

Layout without run containers (SERIAL_COOKIE_NO_RUNCONTAINER = 12346):
  uint32  cookie = 12346
  uint32  n_containers
  n x (uint16 key, uint16 cardinality-1)     -- descriptive header
  n x uint32 offset                           -- container byte offsets
  n x container bytes (array or bitset, see below)

Layout with run containers (SERIAL_COOKIE = 12347):
  uint32  (n_containers - 1) << 16 | 12347    -- count embedded in cookie word
  ceil(n/8) bytes                             -- bitset: bit i => container i is runs
  n x (uint16 key, uint16 cardinality-1)      -- descriptive header
  [n x uint32 offset  -- ONLY when n >= NO_OFFSET_THRESHOLD (4)]
  n x container bytes

Container bodies:
  array  (cardinality <= 4096): sorted uint16 values (2 bytes per value)
  bitset (cardinality  > 4096): 8 KiB fixed bitset (1024 uint64 words)
  runs: uint16 n_runs, then n_runs x (uint16 start, uint16 length) where the
        run covers [start, start + length] inclusive (length = run card - 1)

``run_optimize=True`` applies the same per-container rule CRoaring's
``run_optimize()`` uses: encode as runs iff ``2 + 4*n_runs`` is smaller than
the array/bitset body the container would otherwise take; the run cookie is
emitted only when at least one container actually converts.

Everything is little-endian. numpy does the per-container pack/unpack, so
encode/decode of a large position set is vectorized, not per-value Python.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347  # run containers present; count lives in the high half
NO_OFFSET_THRESHOLD = 4  # spec: run-cookie streams omit offsets below this
ARRAY_MAX = 4096  # cardinality threshold: array container vs bitmap container
BITMAP_BYTES = 8192


def _container_runs(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run starts, run lengths-1) of a sorted unique uint16 value array."""
    breaks = np.flatnonzero(np.diff(vals.astype(np.int32)) != 1)
    start_idx = np.concatenate(([0], breaks + 1))
    end_idx = np.concatenate((breaks, [vals.size - 1]))
    return vals[start_idx], vals[end_idx] - vals[start_idx]


def roaring_serialize(positions, assume_normalized: bool = False, run_optimize: bool = False) -> bytes:
    """Serialize an iterable of uint32 ints to portable Roaring bytes.

    ndarray input is vectorized end-to-end (np.unique sorts + dedups);
    arbitrary iterables are converted first. No per-value Python loop —
    at 8K positions/row the loop was the encode hot path, not the packing.
    ``assume_normalized`` skips the sort+dedup for callers that already
    hold a unique-sorted int64 ndarray (the MDV2 framing encoder) so each
    row is normalized exactly once. ``run_optimize`` enables run containers
    where they win (the reference always run-optimizes before serializing).
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
    n = len(uniq_keys)

    desc = bytearray()
    containers: list[bytes] = []
    run_flags = np.zeros(n, dtype=bool)
    for ci, key in enumerate(uniq_keys):
        vals = lows[bounds[ci] : bounds[ci + 1]]
        card = vals.size
        desc += struct.pack("<HH", int(key), card - 1)
        flat_bytes = 2 * card if card <= ARRAY_MAX else BITMAP_BYTES
        if run_optimize:
            run_starts, run_lens = _container_runs(vals)
            if 2 + 4 * run_starts.size < flat_bytes:
                run_flags[ci] = True
                body = np.empty(2 * run_starts.size, dtype="<u2")
                body[0::2] = run_starts
                body[1::2] = run_lens
                containers.append(struct.pack("<H", run_starts.size) + body.tobytes())
                continue
        if card <= ARRAY_MAX:
            containers.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(BITMAP_BYTES // 8, dtype="<u8")
            idx = vals.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> np.uint32(6), np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64))
            containers.append(bits.tobytes())

    if run_flags.any():
        header = bytearray()
        header += struct.pack("<I", ((n - 1) << 16) | SERIAL_COOKIE)
        header += np.packbits(run_flags, bitorder="little").tobytes()
        header += desc
        with_offsets = n >= NO_OFFSET_THRESHOLD
    else:
        header = bytearray(struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)) + desc
        with_offsets = True

    if with_offsets:
        offsets = bytearray()
        pos = len(header) + 4 * n
        for c in containers:
            offsets += struct.pack("<I", pos)
            pos += len(c)
        return bytes(header) + bytes(offsets) + b"".join(containers)
    return bytes(header) + b"".join(containers)


def _expand_runs(pairs: np.ndarray) -> np.ndarray:
    """Expand (start, length) uint16 run pairs to uint32 values, vectorized."""
    starts = pairs[0::2].astype(np.uint32)
    lens = pairs[1::2].astype(np.int64) + 1
    total = int(lens.sum())
    # out[j] = starts[run(j)] + (j - first_index_of_run(j))
    first = np.concatenate(([0], np.cumsum(lens)[:-1]))
    run_of = np.repeat(np.arange(starts.size), lens)
    return (starts[run_of] + (np.arange(total) - first[run_of]).astype(np.uint32)).astype(np.uint32)


def roaring_deserialize_np(blob: bytes) -> "np.ndarray":
    """Parse portable Roaring bytes (either cookie) to a sorted int64 ndarray."""
    (word,) = struct.unpack_from("<I", blob, 0)
    if word == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", blob, 4)
        run_flags = np.zeros(n, dtype=bool)
        desc_off = 8
        data_off = desc_off + 4 * n + 4 * n  # descriptors then offsets
    elif (word & 0xFFFF) == SERIAL_COOKIE:
        n = (word >> 16) + 1
        flag_bytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(blob, dtype=np.uint8, count=flag_bytes, offset=4), bitorder="little"
        )[:n].astype(bool)
        desc_off = 4 + flag_bytes
        data_off = desc_off + 4 * n + (4 * n if n >= NO_OFFSET_THRESHOLD else 0)
    else:
        raise ValueError(f"unsupported roaring cookie {word & 0xFFFF}")
    desc = np.frombuffer(blob, dtype="<u2", count=2 * n, offset=desc_off).reshape(n, 2)
    # sequential walk: correct for both cookies, with or without offsets
    out: list[np.ndarray] = []
    pos = data_off
    for ci in range(n):
        key = np.uint32(desc[ci, 0]) << np.uint32(16)
        card = int(desc[ci, 1]) + 1
        if run_flags[ci]:
            (n_runs,) = struct.unpack_from("<H", blob, pos)
            pairs = np.frombuffer(blob, dtype="<u2", count=2 * n_runs, offset=pos + 2)
            lows = _expand_runs(pairs)
            if lows.size != card:
                raise ValueError(f"corrupt run container: {lows.size} != {card}")
            pos += 2 + 4 * n_runs
        elif card <= ARRAY_MAX:
            lows = np.frombuffer(blob, dtype="<u2", count=card, offset=pos).astype(np.uint32)
            pos += 2 * card
        else:
            bits = np.frombuffer(blob, dtype="<u8", count=BITMAP_BYTES // 8, offset=pos)
            lows = np.flatnonzero(np.unpackbits(bits.view(np.uint8), bitorder="little")).astype(np.uint32)
            pos += BITMAP_BYTES
        out.append(key | lows)
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out).astype(np.int64)


def roaring_deserialize(blob: bytes) -> list[int]:
    """Parse portable Roaring bytes back to a sorted list of ints."""
    return roaring_deserialize_np(blob).tolist()
