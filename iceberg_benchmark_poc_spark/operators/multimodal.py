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

    Real parsers for P6 PPM, P5 PGM (Netpbm spec) and uncompressed 24-bit
    BI_RGB BMP (bottom-up or top-down per the height sign). RGB inputs
    reduce to luminance with integer BT.601 weights. Raises ValueError on
    unsupported magic (compressed codecs need libraries absent here).
    """
    b = bytes(payload)
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
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size, w, h_signed = struct.unpack_from("<Iii", b, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        h = abs(h_signed)
        row_stride = (w * 3 + 3) & ~3
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
