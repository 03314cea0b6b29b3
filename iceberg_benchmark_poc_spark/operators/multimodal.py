"""Multimodal column plumbing: real codecs + Arrow-batched Pandas-UDF pipelines.

Images/audio/video are modeled as ``BinaryType`` payload columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — the canonical
Spark shape for media feature extraction at scale: the binary bytes never
leave the executor, batches stream through Arrow, and the output schema is a
fixed contract the rest of the (relational) pipeline joins on.

``decode_media`` is a real, dependency-free decoder for the Netpbm binary
formats (P6 PPM, P5 PGM — the published Netpbm spec: ASCII header with
``#`` comments, single whitespace after maxval, then raw samples) and
uncompressed 24-bit BI_RGB BMP (bottom-up or top-down). Every pipeline
stage below decodes the payload first and computes from the DECODED raster
— pixel counts, luminance histograms, true-dimension resampling — so the
whole path is what a production image pipeline runs, minus only the
compressed codecs (JPEG/PNG/MP4 need libjpeg/ffmpeg, absent here; the
parser raises ValueError on unknown magic like any decoder would).

Luminance uses the integer ITU-R BT.601 weights (299, 587, 114)/1000 —
exact in integer arithmetic, and the identity on the gray pixels the
fixture encoder emits (r == g == b).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# codecs: Netpbm (P5/P6) and 24-bit BMP, encode + decode
# ---------------------------------------------------------------------------


def encode_ppm(gray: bytes, width: int, height: int) -> bytes:
    """Encode a grayscale raster as a binary P6 PPM (each pixel (b, b, b))."""
    if len(gray) != width * height:
        raise ValueError(f"raster is {len(gray)} bytes, expected {width}x{height}")
    rgb = bytearray(len(gray) * 3)
    rgb[0::3] = gray
    rgb[1::3] = gray
    rgb[2::3] = gray
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb)


def encode_pgm(gray: bytes, width: int, height: int) -> bytes:
    """Encode a grayscale raster as a binary P5 PGM (one byte per pixel)."""
    if len(gray) != width * height:
        raise ValueError(f"raster is {len(gray)} bytes, expected {width}x{height}")
    return b"P5\n%d %d\n255\n" % (width, height) + gray


def encode_bmp(gray: bytes, width: int, height: int) -> bytes:
    """Encode a grayscale raster as an uncompressed 24-bit bottom-up BMP."""
    if len(gray) != width * height:
        raise ValueError(f"raster is {len(gray)} bytes, expected {width}x{height}")
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    pixel_bytes = row_stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    body = bytearray(pixel_bytes)
    for y in range(height):
        src = gray[(height - 1 - y) * width : (height - y) * width]  # bottom-up
        row = bytearray(row_stride)
        for x, b in enumerate(src):
            row[x * 3 : x * 3 + 3] = bytes((b, b, b))  # BGR — equal channels
        body[y * row_stride : (y + 1) * row_stride] = row
    return header + bytes(body)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor per the PNG spec (RFC 2083 §6.6): nearest of left/up/
    upper-left to p = a + b - c, ties broken a, then b."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(gray: bytes, width: int, height: int) -> bytes:
    """Encode a grayscale raster as a real PNG (color type 0, bit depth 8).

    The row filter CYCLES through all five spec filters (None/Sub/Up/
    Average/Paeth, y % 5) so every decoder unfilter path is exercised by
    round-trip tests and by the fixture payloads — a lazy all-None encoder
    would leave Sub/Average/Paeth reconstruction untested. Compressed with
    stdlib zlib (the only codec PNG's IDAT allows).
    """
    import zlib

    if len(gray) != width * height:
        raise ValueError(f"raster is {len(gray)} bytes, expected {width}x{height}")
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = gray[y * width : (y + 1) * width]
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes((row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width))
        elif ftype == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(width))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[x] - (((row[x - 1] if x else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(width)
            )
        else:  # Paeth
            raw += bytes(
                (row[x] - _paeth(row[x - 1] if x else 0, prev[x], prev[x - 1] if x else 0))
                & 0xFF
                for x in range(width)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(b: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG to (width, height, grayscale raster).

    Spec-conforming for the still-image core: chunk CRC validation,
    multi-IDAT concatenation, bit depth 8, color types 0 (grayscale) and
    2 (RGB — reduced via integer BT.601 like the BMP/PPM branches), filter
    method 0 with all five row filters, no interlace. ValueError on
    anything malformed or outside that envelope.
    """
    import zlib

    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(b):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("truncated PNG (no IEND)")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit gray/RGB non-interlaced PNG supported "
            f"(depth={depth} color={color} interlace={interlace})"
        )
    bpp = 1 if color == 0 else 3
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = w * bpp
    if len(raw) != (stride + 1) * h:
        raise ValueError(f"PNG scanline data is {len(raw)} bytes, expected {(stride + 1) * h}")
    recon = bytearray(stride * h)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        prev_off = off - stride
        if ftype == 0:
            recon[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = recon[off + x - bpp] if x >= bpp else 0
                recon[off + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = recon[prev_off + x] if y else 0
                recon[off + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = recon[off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + x] if y else 0
                recon[off + x] = (line[x] + ((a + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = recon[off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + x] if y else 0
                c = recon[prev_off + x - bpp] if (y and x >= bpp) else 0
                recon[off + x] = (line[x] + _paeth(a, up, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
    if color == 0:
        return w, h, bytes(recon)
    gray = bytes(
        _luma(recon[i], recon[i + 1], recon[i + 2]) for i in range(0, len(recon), 3)
    )
    return w, h, gray


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary Netpbm header: returns (width, height, maxval, offset).

    Follows the published spec: tokens separated by whitespace, ``#``
    comments run to end-of-line, and exactly ONE whitespace byte follows
    maxval before the raster.
    """
    pos = 2  # past the magic
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PNM header byte {c!r}")
    return vals[0], vals[1], vals[2], pos + 1  # single whitespace after maxval


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def decode_media(payload: bytes, media_type: str = "image") -> tuple[int, int, bytes]:
    """Decode an image payload into (width, height, grayscale raster).

    Real parsers for P6 PPM, P5 PGM (Netpbm spec), uncompressed 24-bit
    BI_RGB BMP (bottom-up or top-down per the height sign), and PNG
    (8-bit gray/RGB, all five row filters, stdlib-zlib inflate — the one
    compressed real-world format decodable dependency-free). RGB inputs
    reduce to luminance with integer BT.601 weights. Raises ValueError on
    unsupported magic (other compressed codecs need libraries absent here).
    """
    b = bytes(payload)
    if b[:2] == _PNG_SIG[:2]:
        return _decode_png(b)
    if b[:2] == b"P6":
        w, h, maxval, off = _pnm_header(b)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        raw = b[off : off + w * h * 3]
        if len(raw) != w * h * 3:
            raise ValueError("truncated PPM raster")
        gray = bytes(_luma(raw[i], raw[i + 1], raw[i + 2]) for i in range(0, len(raw), 3))
        return w, h, gray
    if b[:2] == b"P5":
        w, h, maxval, off = _pnm_header(b)
        if maxval > 255:
            raise ValueError("16-bit PGM not supported")
        raw = b[off : off + w * h]
        if len(raw) != w * h:
            raise ValueError("truncated PGM raster")
        return w, h, raw
    if b[:2] == b"BM":
        if len(b) < 30:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size, w, h_signed = struct.unpack_from("<Iii", b, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        h = abs(h_signed)
        row_stride = (w * 3 + 3) & ~3
        if w < 0 or data_off + row_stride * h > len(b):
            raise ValueError(
                f"truncated BMP raster ({len(b)} bytes, need {data_off + row_stride * h})"
            )
        gray = bytearray(w * h)
        for y in range(h):
            src_y = (h - 1 - y) if h_signed > 0 else y  # positive height = bottom-up
            row = b[data_off + src_y * row_stride : data_off + src_y * row_stride + w * 3]
            for x in range(w):
                bb, gg, rr = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
                gray[y * w + x] = _luma(rr, gg, bb)
        return w, h, bytes(gray)
    raise ValueError(
        f"unsupported media payload (magic {b[:2]!r}, type {media_type}): "
        "compressed codecs (JPEG/PNG/MP4) need libraries not present here"
    )


# ---------------------------------------------------------------------------
# fixture geometry: text bytes -> square-ish raster -> real PPM payload
# ---------------------------------------------------------------------------


def square_grid(n: int) -> tuple[int, int]:
    """Raster dims for an n-byte stream: width ceil(sqrt(n)), minimal height.

    The same IEEE chain the oracles run (sqrt/ceil on doubles), so both
    engines agree on the geometry at every payload size.
    """
    w = max(int(math.ceil(math.sqrt(n))), 1)
    h = max(int(math.ceil(n / w)), 1)
    return w, h


def text_to_ppm(text_bytes: bytes) -> bytes:
    """Encode a byte stream as a real P6 PPM: square-ish grid, the tail
    padded by repeating the LAST byte (so raster[i] == stream[min(i, n-1)],
    the clamp form the SQL oracles can express with substr+repeat)."""
    n = len(text_bytes)
    w, h = square_grid(n)
    pad = (text_bytes[-1:] or b"\x00") * (w * h - n)
    return encode_ppm(text_bytes + pad, w, h)


def text_to_image(text_bytes: bytes, container: int) -> bytes:
    """text_to_ppm's raster in one of the four containers (0 PPM, 1 PGM,
    2 BMP, 3 PNG). All four decode back to the identical grayscale raster,
    so the image-query oracles are container-independent — the fixture
    mixes them per doc_id to keep every decoder on the hash-gated path."""
    n = len(text_bytes)
    w, h = square_grid(n)
    pad = (text_bytes[-1:] or b"\x00") * (w * h - n)
    raster = text_bytes + pad
    enc = (encode_ppm, encode_pgm, encode_bmp, encode_png)[container % 4]
    return enc(raster, w, h)


# ---------------------------------------------------------------------------
# pipeline stages: decode-first mapInPandas operators
# ---------------------------------------------------------------------------

MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, first_pixel int, n_frames bigint"
)
FRAME_BYTES = 256  # frame stride over the decoded raster


def media_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over a binary payload column.

    Input: (doc_id BIGINT, payload BINARY). Output: MEDIA_FEATURE_SCHEMA —
    true decoded dimensions, pixel count, first pixel's luminance, frame
    count. One mapInPandas pass — no shuffle; parallelism = input partitions.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_media(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [w for w, _, _ in rows],
                    "height": [h for _, h, _ in rows],
                    "n_pixels": [len(g) for _, _, g in rows],
                    "first_pixel": [g[0] if g else -1 for _, _, g in rows],
                    "n_frames": [len(g) // FRAME_BYTES + 1 for _, _, g in rows],
                }
            )

    return docs_with_payload.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(docs_with_payload: DataFrame, stride: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: one output row per ``stride``-pixel frame of the
    DECODED raster.

    The row-EXPANDING mapInPandas shape (video -> frames, audio -> windows):
    output batches are larger than input batches, which Arrow handles
    natively — the contract is only the output schema. A raster of n pixels
    yields n // stride + 1 frames (the final, possibly-empty partial frame
    included, mirroring media_features' n_frames). Still no shuffle;
    downstream per-frame work parallelizes over the same partitions.
    """

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, gray = decode_media(bytes(payload))
                for k in range(len(gray) // stride + 1):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(gray[k * stride : (k + 1) * stride])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return docs_with_payload.mapInPandas(expand, FRAME_SCHEMA)


#: luminance-histogram embedding dimensionality (buckets of pixel * dim // 256)
EMBED_DIM = 16
EMBED_SCHEMA = "doc_id bigint, embedding array<bigint>"


def media_embedding(docs_with_payload: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Deterministic media embedding: dim-bucket luminance histogram of the
    decoded raster.

    The media -> vector bridge into the similarity stack (q_embed_* / ANN):
    a real model would emit float activations here; the pixel histogram
    keeps the leaf deterministic and oracle-checkable while the Spark
    plumbing (decode, ARRAY column out of mapInPandas, Arrow transport) is
    production-real.
    """
    import numpy as np

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                _, _, gray = decode_media(bytes(p))
                embs.append(
                    np.bincount(
                        np.frombuffer(gray, dtype=np.uint8).astype(np.int64) * dim // 256,
                        minlength=dim,
                    )[:dim].tolist()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return docs_with_payload.mapInPandas(hist, EMBED_SCHEMA)


RESIZE_W = 8
RESIZE_H = 8
RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary"


def resize_media(docs_with_payload: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H) -> DataFrame:
    """Nearest-neighbor resize of each decoded raster to out_w x out_h.

    The resize stage of an image pipeline, over the image's TRUE decoded
    geometry: every output pixel (x, y) picks source pixel
    (x * in_w // out_w, y * in_h // out_h) of the decoded grayscale raster.
    Fixed-size binary output contract, Arrow transport, one mapInPandas
    pass, no shuffle.
    """

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            px: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                in_w, in_h, gray = decode_media(bytes(payload))
                out = bytes(
                    gray[(y * in_h // out_h) * in_w + (x * in_w // out_w)]
                    for y in range(out_h)
                    for x in range(out_w)
                )
                ids.append(doc_id)
                px.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "pixels": px,
                }
            )

    return docs_with_payload.mapInPandas(rs, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE PCM16 codec + windowed feature extraction
# ---------------------------------------------------------------------------

AUDIO_RATE = 16_000  # fixture sample rate (Hz)
AUDIO_WIN = 256  # feature-window stride in samples
#: samples synthesized per text character in the fixture payloads
AUDIO_SAMPLES_PER_CHAR = 4


def encode_wav(samples: "bytes | memoryview", sample_rate: int = AUDIO_RATE) -> bytes:
    """Encode little-endian PCM16 mono frames as a canonical RIFF/WAVE file.

    The published WAVE format: RIFF header, ``fmt `` chunk (PCM tag 1,
    1 channel, 16 bits), then the ``data`` chunk. ``samples`` is the raw
    little-endian int16 byte stream.
    """
    data = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks pad to even length
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[int, "object"]:
    """Parse a RIFF/WAVE file: returns (sample_rate, int16 ndarray).

    A real chunk-walking parser: validates the RIFF/WAVE magic, skips
    unknown chunks by their declared size (odd sizes padded, per spec),
    reads the format from ``fmt `` and the frames from ``data``. Raises
    ValueError on non-WAV bytes or non-PCM16-mono encodings, like any
    decoder would.
    """
    import numpy as np

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate: int | None = None
    data: bytes | None = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAVE encoding: tag={tag} ch={channels} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunk sizes pad one byte
    if rate is None or data is None:
        raise ValueError("WAVE file missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def text_to_wav(text_bytes: bytes, samples_per_char: int = AUDIO_SAMPLES_PER_CHAR) -> bytes:
    """Synthesize a deterministic PCM16 waveform from a byte stream and
    encode it as a real WAV: sample i is
    ``((stream[i % n] * 523 + i * 7919) % 65536) - 32768`` — pure integer
    arithmetic, so the SQL oracles reproduce every sample exactly."""
    import numpy as np

    n = len(text_bytes)
    if n == 0:
        return encode_wav(b"")
    total = n * samples_per_char
    i = np.arange(total, dtype=np.int64)
    src = np.frombuffer(text_bytes, dtype=np.uint8).astype(np.int64)
    samples = ((src[i % n] * 523 + i * 7919) % 65536) - 32768
    return encode_wav(samples.astype("<i2").tobytes())


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, energy_sq bigint, "
    "max_abs int, zero_crossings bigint, loudest_win bigint, n_windows bigint"
)


def audio_features(docs_with_payload: DataFrame, win: int = AUDIO_WIN) -> DataFrame:
    """Windowed audio features from DECODED WAV payloads, one mapInPandas pass.

    Per document: total energy (sum of squared samples — exact BIGINT,
    |s| <= 2^15 so a 2^63 budget holds past 2^32 samples), peak amplitude,
    zero-crossing count (sign change between consecutive samples, sign(0)
    treated as +), the index of the loudest ``win``-sample window (first on
    ties, matching np.argmax), and the window count. Everything integer, so
    the DuckDB oracle replays the synthesis formula and matches hash-exactly.
    No shuffle; parallelism = input partitions.
    """
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "energy_sq",
                "max_abs", "zero_crossings", "loudest_win", "n_windows",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                s = s.astype(np.int64)
                sq = s * s
                nw = (len(s) + win - 1) // win if len(s) else 0
                if nw:
                    wins = np.add.reduceat(sq, np.arange(0, len(s), win))
                    loudest = int(np.argmax(wins))
                else:
                    loudest = -1
                nonneg = s >= 0
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["energy_sq"].append(int(sq.sum()))
                out["max_abs"].append(int(np.abs(s).max()) if len(s) else 0)
                out["zero_crossings"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
                out["loudest_win"].append(loudest)
                out["n_windows"].append(nw)
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(feats, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# video: uncompressed AVI (RIFF) container + motion features
# ---------------------------------------------------------------------------

VIDEO_W = 10  # 30-byte rows -> 32-byte stride: the 4-byte row padding is real
VIDEO_H = 6
VIDEO_FPS = 10
VIDEO_MAX_FRAMES = 8
#: a new frame every this many text characters (plus frame 0)
VIDEO_CHARS_PER_FRAME = 128


def _dib_frame(gray: bytes, width: int, height: int) -> bytes:
    """One uncompressed bottom-up 24-bit DIB frame body (BGR rows padded to
    4 bytes) — byte-identical to the pixel array of ``encode_bmp``."""
    row_stride = (width * 3 + 3) & ~3
    body = bytearray(row_stride * height)
    for y in range(height):
        src = gray[(height - 1 - y) * width : (height - y) * width]
        row = bytearray(row_stride)
        for x, b in enumerate(src):
            row[x * 3 : x * 3 + 3] = bytes((b, b, b))
        body[y * row_stride : (y + 1) * row_stride] = row
    return bytes(body)


def encode_avi(frames: list[bytes], width: int, height: int, fps: int = VIDEO_FPS) -> bytes:
    """Encode grayscale rasters as a spec-conforming uncompressed AVI:
    RIFF 'AVI ' -> LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER)) -> LIST movi ('00db' raw DIB frames)."""
    row_stride = (width * 3 + 3) & ~3
    frame_bytes = row_stride * height
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, frame_bytes * fps, 0, 0x10, len(frames), 0, 1,
        frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                        len(frames), frame_bytes, 0, frame_bytes)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", _dib_frame(f, width, height)) for f in frames))
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) + b"AVI " + hdrl + movi


def decode_avi(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an uncompressed AVI: returns (width, height, grayscale frames).

    A real container parser sharing RIFF discipline with ``decode_wav``:
    validates the 'AVI ' form, walks LIST chunks recursively, reads the
    geometry from the strf BITMAPINFOHEADER (24-bit BI_RGB only), collects
    '00db'/'00dc' frame chunks from the movi list, checks the frame count
    against the avih header, and reduces each bottom-up padded BGR frame to
    luminance exactly like the BMP decoder. ValueError on anything else.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    declared_frames = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, declared_frames
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) < size:
                raise ValueError(f"truncated AVI chunk {cid!r} ({len(body)}/{size} bytes)")
            if cid == b"LIST":
                walk(body[4:])  # skip the 4-byte list kind
            elif cid == b"avih":
                if len(body) < 20:
                    raise ValueError("truncated avih header")
                declared_frames = struct.unpack_from("<I", body, 16)[0]
            elif cid == b"strf":
                if len(body) < 20:
                    raise ValueError("truncated strf BITMAPINFOHEADER")
                _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", body, 0)
                if bpp != 24 or comp != 0:
                    raise ValueError(f"only uncompressed 24-bit AVI supported (bpp={bpp})")
                width, height = w, abs(h)
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(body)
            pos += 8 + size + (size % 2)

    walk(blob[12:])
    if width is None or height is None:
        raise ValueError("AVI missing strf geometry")
    if declared_frames is not None and declared_frames != len(frames_raw):
        raise ValueError(f"avih declares {declared_frames} frames, movi has {len(frames_raw)}")
    row_stride = (width * 3 + 3) & ~3
    frames: list[bytes] = []
    for raw in frames_raw:
        if len(raw) < row_stride * height:
            raise ValueError(
                f"truncated AVI frame ({len(raw)} bytes, need {row_stride * height})"
            )
        gray = bytearray(width * height)
        for y in range(height):
            src_y = height - 1 - y  # bottom-up
            row = raw[src_y * row_stride : src_y * row_stride + width * 3]
            for x in range(width):
                bb, gg, rr = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
                gray[y * width + x] = _luma(rr, gg, bb)
        frames.append(bytes(gray))
    return width, height, frames


def text_to_avi(text_bytes: bytes) -> bytes:
    """Synthesize a deterministic multi-frame video from a byte stream:
    ``1 + n // VIDEO_CHARS_PER_FRAME`` frames (capped at VIDEO_MAX_FRAMES)
    of VIDEO_W x VIDEO_H, where frame f's pixel i is
    ``stream[(i * 3 + f * 7) % n]`` — the closed form the SQL oracles replay."""
    n = len(text_bytes)
    if n == 0:
        return encode_avi([bytes(VIDEO_W * VIDEO_H)], VIDEO_W, VIDEO_H)
    n_frames = min(1 + n // VIDEO_CHARS_PER_FRAME, VIDEO_MAX_FRAMES)
    frames = [
        bytes(text_bytes[(i * 3 + f * 7) % n] for i in range(VIDEO_W * VIDEO_H))
        for f in range(n_frames)
    ]
    return encode_avi(frames, VIDEO_W, VIDEO_H)


VIDEO_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames bigint, total_luma bigint, "
    "first_pixel int, moving_pixels bigint"
)


def video_features(docs_with_payload: DataFrame) -> DataFrame:
    """Motion features from DECODED AVI frames, one mapInPandas pass.

    Per video: geometry, frame count, total luminance mass across all
    frames (exact BIGINT), first pixel of frame 0, and the motion metric —
    the count of (frame, pixel) pairs that changed value vs the previous
    frame. All integer, so the oracle replays the synthesis formula and the
    gate is hash-exact. No shuffle; parallelism = input partitions.
    """
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "n_frames", "total_luma",
                "first_pixel", "moving_pixels",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_avi(bytes(payload))
                stack = np.stack([np.frombuffer(f, dtype=np.uint8) for f in frames]).astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["total_luma"].append(int(stack.sum()))
                out["first_pixel"].append(int(stack[0, 0]))
                out["moving_pixels"].append(int((stack[1:] != stack[:-1]).sum()))
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(feats, VIDEO_FEATURE_SCHEMA)
