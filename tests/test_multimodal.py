"""Multimodal: real codec round-trips, batch-shape contracts, the ANN bridge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.operators.multimodal import (
    EMBED_DIM,
    FRAME_BYTES,
    decode_media,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    media_embedding,
    sample_frames,
    square_grid,
    text_to_ppm,
)
from iceberg_benchmark_poc_spark.operators.vectors import cosine_topk
from iceberg_benchmark_poc_spark.queries.multimodal import _ppm_payloads

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# codec unit tests (no Spark): every format round-trips bit-exactly
# ---------------------------------------------------------------------------

RASTER = bytes(range(20)) * 3  # 60 bytes
W, H = 10, 6


def test_ppm_roundtrip():
    w, h, gray = decode_media(encode_ppm(RASTER, W, H))
    assert (w, h, gray) == (W, H, RASTER)


def test_pgm_roundtrip():
    w, h, gray = decode_media(encode_pgm(RASTER, W, H))
    assert (w, h, gray) == (W, H, RASTER)


def test_bmp_roundtrip_bottom_up():
    # width 10 -> 30-byte rows pad to 32: exercises the 4-byte row stride
    w, h, gray = decode_media(encode_bmp(RASTER, W, H))
    assert (w, h, gray) == (W, H, RASTER)


def test_bmp_top_down():
    # negative height = top-down row order per the BMP spec
    import struct

    b = bytearray(encode_bmp(RASTER, W, H))
    # flip height sign and reverse the stored row order
    data_off = struct.unpack_from("<I", b, 10)[0]
    struct.pack_into("<i", b, 22, -H)
    stride = (W * 3 + 3) & ~3
    rows = [bytes(b[data_off + y * stride : data_off + (y + 1) * stride]) for y in range(H)]
    b[data_off:] = b"".join(reversed(rows))
    w, h, gray = decode_media(bytes(b))
    assert (w, h, gray) == (W, H, RASTER)


def test_pnm_header_comments_and_whitespace():
    # the Netpbm spec allows # comments and arbitrary whitespace in the header
    payload = b"P5\n# a comment\n  10\t6 # trailing\n255\n" + RASTER
    assert decode_media(payload) == (W, H, RASTER)


def test_rgb_luminance_is_bt601():
    # a non-gray pixel reduces with the integer (299, 587, 114)/1000 weights
    ppm = b"P6\n1 1\n255\n" + bytes((200, 100, 50))
    _, _, gray = decode_media(ppm)
    assert gray == bytes([(299 * 200 + 587 * 100 + 114 * 50) // 1000])


def test_png_roundtrip_all_filters():
    # H=6 rows cycle filters None/Sub/Up/Average/Paeth + None again
    from iceberg_benchmark_poc_spark.operators.multimodal import encode_png

    w, h, gray = decode_media(encode_png(RASTER, W, H))
    assert (w, h, gray) == (W, H, RASTER)
    # a raster tall enough to hit every filter at least twice, wide enough
    # for left-neighbor deps (Sub/Paeth) to matter
    big = bytes((i * 37 + (i * i) % 251) % 256 for i in range(31 * 11))
    assert decode_media(encode_png(big, 31, 11)) == (31, 11, big)


def test_png_rgb_color_type_2_reduces_to_luma():
    import struct as _struct
    import zlib

    from iceberg_benchmark_poc_spark.operators.multimodal import _PNG_SIG, _png_chunk

    # hand-build a 2x1 RGB PNG (color type 2, filter 0)
    px = bytes((200, 100, 50, 10, 20, 30))
    ihdr = _struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + px))
        + _png_chunk(b"IEND", b"")
    )
    w, h, gray = decode_media(blob)
    assert (w, h) == (2, 1)
    assert gray == bytes(
        [(299 * 200 + 587 * 100 + 114 * 50) // 1000, (299 * 10 + 587 * 20 + 114 * 30) // 1000]
    )


def test_png_corruption_raises_valueerror():
    from iceberg_benchmark_poc_spark.operators.multimodal import encode_png

    blob = bytearray(encode_png(RASTER, W, H))
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_media(bytes(blob[:-8]))  # IEND gone
    blob[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_media(bytes(blob))


def test_unsupported_magic_raises():
    with pytest.raises(ValueError, match="unsupported media payload"):
        decode_media(b"GIF89a......")


def test_truncated_payloads_raise_valueerror_not_indexerror():
    """Every decoder promises ValueError on malformed input (r04 advice: the
    BMP/AVI branches used to escape with IndexError/struct.error)."""
    from iceberg_benchmark_poc_spark.operators.multimodal import decode_avi, encode_avi

    bmp = encode_bmp(RASTER, W, H)
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_media(bmp[:20])  # mid-header
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_media(bmp[:-7])  # short raster
    avi = encode_avi([RASTER], W, H)
    with pytest.raises(ValueError, match="truncated AVI"):
        decode_avi(avi[:-5])  # short final frame chunk
    with pytest.raises(ValueError, match="truncated PPM"):
        decode_media(encode_ppm(RASTER, W, H)[:-3])


def test_audio_oracle_sample_cap_bounds_every_fixture_sf():
    """q_audio_features' oracle replays at most _AUDIO_MAX_SAMPLES samples per
    doc; if a fixture text ever outgrew it the ORACLE side would silently
    truncate and turn the driver red on a correct engine result (r04 advice).
    Pin the bound to the DATA at every stock SF — the sf1/sf10 scale-ups
    duplicate texts without lengthening them, so the stock tables are the
    worst case."""
    import glob
    import os

    import duckdb

    from iceberg_benchmark_poc_spark.operators.multimodal import AUDIO_SAMPLES_PER_CHAR
    from iceberg_benchmark_poc_spark.queries.multimodal import _AUDIO_MAX_SAMPLES

    # derive the fixture root from the suite's configured SF dir (r05 advice:
    # no hardcoded /root/testdata, no vacuous pass in other checkouts)
    testdata_root = os.path.dirname(os.path.abspath(SF_DIR))
    paths = sorted(glob.glob(os.path.join(testdata_root, "sf*", "documents.parquet")))
    if not paths:
        pytest.skip(f"no sf*/documents.parquet fixtures under {testdata_root}")

    con = duckdb.connect()
    for path in paths:
        sf = os.path.basename(os.path.dirname(path))
        (max_len,) = con.sql(f"SELECT max(length(text)) FROM read_parquet('{path}')").fetchone()
        assert max_len * AUDIO_SAMPLES_PER_CHAR <= _AUDIO_MAX_SAMPLES, (
            f"{sf}: longest text {max_len} x {AUDIO_SAMPLES_PER_CHAR} samples/char "
            f"exceeds the oracle cap {_AUDIO_MAX_SAMPLES} — raise _AUDIO_MAX_SAMPLES"
        )


def test_text_to_ppm_pads_with_last_byte():
    t = b"hello world"  # n=11 -> 4x3 grid, one pad byte
    w, h = square_grid(len(t))
    got_w, got_h, gray = decode_media(text_to_ppm(t))
    assert (got_w, got_h) == (w, h)
    assert gray[: len(t)] == t
    assert gray[len(t) :] == t[-1:] * (w * h - len(t))


# ---------------------------------------------------------------------------
# pipeline contracts over the real fixture payloads
# ---------------------------------------------------------------------------


def _payloads(spark):
    return _ppm_payloads(load_table(spark, SF_DIR, "documents"))


def test_sample_frames_expands_rows(spark):
    p = _payloads(spark).cache()
    try:
        # expected frames per doc: decoded pixels (w*h) // stride + 1
        n_pix = F.pandas_udf(
            lambda s: s.map(lambda b: len(decode_media(bytes(b))[2])), "long"
        )
        sized = p.select("doc_id", n_pix("payload").alias("n"))
        expected = sized.select(
            F.sum(F.floor(F.col("n") / FRAME_BYTES) + 1).cast("bigint")
        ).collect()[0][0]
        frames = sample_frames(p)
        assert frames.count() == expected
        # frames reassemble to the full decoded raster
        bad = (
            frames.groupBy("doc_id")
            .agg(F.sum(F.length("frame")).alias("got"))
            .join(sized, "doc_id")
            .filter(F.col("got") != F.col("n"))
            .count()
        )
        assert bad == 0
    finally:
        p.unpersist()


def test_media_embedding_feeds_similarity_stack(spark):
    emb = media_embedding(_payloads(spark)).select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("float")).alias("embedding"),
    )
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    top = cosine_topk(emb, F.col("vec_id") % 100 == 0, k=2).collect()
    n_queries = emb.filter(F.col("vec_id") % 100 == 0).count()
    assert len(top) == 2 * n_queries
    assert all(-1.0 <= r["cosine"] <= 1.0 + 1e-9 for r in top)


def test_embedding_dim_and_total(spark):
    rows = media_embedding(_payloads(spark)).collect()
    p = {r["doc_id"]: r for r in _payloads(spark).collect()}
    for r in rows[:50]:
        assert len(r["embedding"]) == EMBED_DIM
        # histogram mass == decoded pixel count (w*h, including clamp padding)
        _, _, gray = decode_media(bytes(p[r["doc_id"]]["payload"]))
        assert sum(r["embedding"]) == len(gray)


def test_resize_identity_on_square_input(spark):
    """Resizing an exactly 8x8 image to 8x8 must return it unchanged
    (nearest-neighbor with matching grids is the identity)."""
    from iceberg_benchmark_poc_spark.operators.multimodal import resize_media

    raster = bytes(range(64))
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(raster, 8, 8)))], "doc_id long, payload binary"
    )
    [row] = resize_media(df).collect()
    assert (row["width"], row["height"]) == (8, 8)
    assert bytes(row["pixels"]) == raster


def test_wav_roundtrip_and_chunk_walk():
    """encode_wav -> decode_wav is the identity on samples and rate, the
    parser skips unknown chunks by declared size (odd sizes padded, per
    RIFF spec), and non-WAV / non-PCM16 payloads raise like any decoder."""
    import struct

    import numpy as np

    from iceberg_benchmark_poc_spark.operators.multimodal import decode_wav, encode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 523], dtype="<i2")
    blob = encode_wav(samples.tobytes(), sample_rate=8000)
    rate, out = decode_wav(blob)
    assert rate == 8000
    assert np.array_equal(out, samples)

    # splice an unknown odd-sized chunk between fmt and data: still decodes
    fmt_end = blob.index(b"data")
    weird = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size -> pad
    spliced = blob[:fmt_end] + weird + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate2, out2 = decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(out2, samples)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI " + b"\x00" * 32)  # not WAVE
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(stereo_fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt
    )
    with _pytest.raises(ValueError):
        decode_wav(bad)  # stereo rejected (and data chunk missing)


def test_text_to_wav_matches_formula():
    """The synthesized waveform is the documented closed form — the same
    integer chain the SQL oracle replays."""
    import numpy as np

    from iceberg_benchmark_poc_spark.operators.multimodal import (
        AUDIO_SAMPLES_PER_CHAR,
        decode_wav,
        text_to_wav,
    )

    text = b"spark audio!"
    rate, s = decode_wav(text_to_wav(text))
    n = len(text)
    assert len(s) == n * AUDIO_SAMPLES_PER_CHAR
    for i, v in enumerate(np.asarray(s, dtype=np.int64)):
        assert v == ((text[i % n] * 523 + i * 7919) % 65536) - 32768


def test_avi_roundtrip_and_header_crosscheck():
    """encode_avi -> decode_avi recovers geometry and every gray frame; the
    parser cross-checks avih's declared frame count against the movi list
    and rejects non-AVI RIFF forms and compressed formats."""
    import struct

    from iceberg_benchmark_poc_spark.operators.multimodal import decode_avi, encode_avi

    frames = [bytes((f * 40 + i) % 256 for i in range(10 * 6)) for f in range(3)]
    blob = encode_avi(frames, 10, 6)
    w, h, out = decode_avi(blob)
    assert (w, h) == (10, 6)
    assert out == frames  # luminance of (b,b,b) DIB rows is the identity

    with pytest.raises(ValueError):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # wrong form

    # corrupt the avih frame count: the cross-check must catch it
    idx = blob.index(b"avih") + 8 + 16
    bad = blob[:idx] + struct.pack("<I", 99) + blob[idx + 4 :]
    with pytest.raises(ValueError):
        decode_avi(bad)


def test_text_to_avi_matches_formula():
    """Frame f, pixel i == text[(i*3 + f*7) % n] — the closed form the SQL
    oracle replays — and the frame count follows the chars-per-frame cap."""
    from iceberg_benchmark_poc_spark.operators.multimodal import (
        VIDEO_CHARS_PER_FRAME,
        VIDEO_MAX_FRAMES,
        decode_avi,
        text_to_avi,
    )

    for text in (b"x", b"hello world", b"abcdefgh" * 50, b"Z" * 2000):
        n = len(text)
        w, h, frames = decode_avi(text_to_avi(text))
        assert len(frames) == min(1 + n // VIDEO_CHARS_PER_FRAME, VIDEO_MAX_FRAMES)
        for f, fr in enumerate(frames):
            assert fr == bytes(text[(i * 3 + f * 7) % n] for i in range(w * h))
