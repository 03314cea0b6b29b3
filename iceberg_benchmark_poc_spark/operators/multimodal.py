"""Multimodal column plumbing: opaque binary payloads + Pandas-UDF pipelines.

Images/audio/video are modeled as ``BinaryType`` payload columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — the canonical
Spark shape for media feature extraction at scale: the binary bytes never
leave the executor, batches stream through Arrow, and the output schema is a
fixed contract the rest of the (relational) pipeline joins on.

The actual codec work (JPEG decode, resampling, frame extraction) requires
libraries not present in this environment, so ``decode_media`` is a
clearly-marked stub; ``media_features`` uses a deterministic byte-level
feature set so the plumbing (schema, batching, UDF signature) is fully real
and testable — swap ``_features_from_payload`` for a real decoder in
production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, n_frames bigint"
FRAME_BYTES = 256  # fake "frame" stride for the deterministic feature set


def decode_media(payload: bytes, media_type: str) -> object:
    """Decode a media payload (image/audio/video) into a frame/sample object.

    STUB: real decoding needs PIL/ffmpeg/librosa, which are not available in
    this environment. The Spark-side plumbing in ``media_features`` is real;
    only this leaf is stubbed.
    """
    raise NotImplementedError(
        f"media decoding ({media_type}) requires codec libraries not present in this environment"
    )


def _features_from_payload(payload: bytes) -> tuple[int, int, int]:
    """Deterministic byte-level stand-in for decode + feature extraction."""
    n = len(payload)
    first = payload[0] if n else -1
    frames = n // FRAME_BYTES + 1
    return n, first, frames


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"

#: byte-histogram embedding dimensionality (buckets of byte >> 4)
EMBED_DIM = 16
EMBED_SCHEMA = "doc_id bigint, embedding array<bigint>"


def sample_frames(docs_with_payload: DataFrame, stride: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: one output row per ``stride``-byte frame of the payload.

    The row-EXPANDING mapInPandas shape (video -> frames, audio -> windows):
    output batches are larger than input batches, which Arrow handles
    natively — the contract is only the output schema. A payload of n bytes
    yields n // stride + 1 frames (the final, possibly-empty partial frame
    included, mirroring media_features' n_frames). Still no shuffle;
    downstream per-frame decoding parallelizes over the same partitions.
    """

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for k in range(len(b) // stride + 1):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(b[k * stride : (k + 1) * stride])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return docs_with_payload.mapInPandas(expand, FRAME_SCHEMA)


def media_embedding(docs_with_payload: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Deterministic media embedding: 16-bucket byte histogram per payload.

    The media -> vector bridge into the similarity stack (q_embed_* / ANN):
    a real model would emit float vectors here; the byte histogram keeps the
    leaf deterministic and oracle-checkable while the Spark plumbing
    (ARRAY column out of mapInPandas, Arrow transport) is production-real.
    """
    import numpy as np

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [
                # bucket derived from dim (byte * dim // 256), not a fixed
                # >> 4: with a hard 16-way shift, dim < 16 silently dropped
                # the top buckets and dim > 16 left zero tails. For dim=16
                # this is exactly byte >> 4 (oracle unchanged).
                np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64) * dim // 256,
                    minlength=dim,
                )[:dim].tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return docs_with_payload.mapInPandas(hist, EMBED_SCHEMA)


def media_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary payload column.

    Input: (doc_id BIGINT, payload BINARY). Output: MEDIA_FEATURE_SCHEMA.
    One mapInPandas pass — no shuffle; parallelism = input partitions.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_features_from_payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "first_byte": feats.map(lambda t: t[1]),
                    "n_frames": feats.map(lambda t: t[2]),
                }
            )

    return docs_with_payload.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


RESIZE_W = 8
RESIZE_H = 8
RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary"


def resize_media(docs_with_payload: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H) -> DataFrame:
    """Nearest-neighbor resize of each payload's byte raster to out_w x out_h.

    The resize stage of an image pipeline: the payload is treated as a
    row-major grid ceil(sqrt(n)) bytes wide (the codec stand-in — a real
    decoder supplies the raster instead), and every output pixel picks its
    clamped nearest source byte. The resampling arithmetic, fixed-size
    binary output contract, and Arrow transport are production-real; one
    mapInPandas pass, no shuffle.
    """
    import math

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            px: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    # empty payload: zero raster (the clamp below would index
                    # b[-1]; every sibling operator tolerates n=0 too)
                    ids.append(doc_id)
                    px.append(bytes(out_w * out_h))
                    continue
                in_w = max(int(math.ceil(math.sqrt(n))), 1)
                in_h = max(int(math.ceil(n / in_w)), 1)
                out = bytes(
                    b[min((y * in_h // out_h) * in_w + (x * in_w // out_w), n - 1)]
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
