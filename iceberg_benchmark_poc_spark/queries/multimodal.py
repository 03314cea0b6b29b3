"""Multimodal-column queries: binary payloads through Arrow-batched UDFs.

Image/audio/video columns at 100 TB are opaque BINARY payloads with typed
metadata; decode/resize/frame-sample run as mapInPandas stages (see
operators/multimodal.py — the codec leaf is stubbed, the Spark plumbing is
real). Here the payload is the document text utf-8 encoded, so the
byte-level features have closed-form SQL equivalents and the whole
Pandas-UDF pipeline — schema contract, Arrow batching, binary transport —
is verified against the DuckDB oracle like every scalar operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..core.registry import register
from ..operators.multimodal import (
    EMBED_DIM,
    FRAME_BYTES,
    RESIZE_H,
    RESIZE_W,
    media_embedding,
    media_features,
    resize_media,
    sample_frames,
)


@register(
    "q_media_features",
    oracle=f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT)                 AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INTEGER)   AS first_byte,
               CAST(length(text) // {FRAME_BYTES} + 1 AS BIGINT) AS n_frames
        FROM documents
        """,
    tags=("multimodal", "pandas-udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas.

    The one deliberately-Python operator in the engine: payload bytes stream
    executor-side through Arrow (never the driver), one pass, no shuffle —
    the exact plan shape a real image/audio decoder plugs into. The oracle
    checks the features in closed form because the test payload is utf-8
    text (documents are ASCII, so n_bytes == length(text) and first_byte is
    the first code point).
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media_features(payloads)


@register(
    "q_frame_sample",
    oracle=f"""
        WITH frames AS (
          SELECT doc_id, text,
                 CAST(unnest(generate_series(0, length(text) // {FRAME_BYTES})) AS INTEGER)
                   AS frame_idx
          FROM documents
        )
        SELECT doc_id,
               frame_idx,
               CAST(length(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS INTEGER)
                 AS frame_len,
               md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
        FROM frames
        """,
    tags=("multimodal", "pandas-udf", "frames"),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: the row-expanding mapInPandas stage, per-frame digests.

    Each payload fans out to n//256+1 frames executor-side (the video ->
    frames / audio -> windows shape); the oracle reconstructs every frame
    with substr (payloads are ASCII text, so byte slices == char slices) and
    must agree on both length and md5 — any batching or slicing error in the
    Arrow path breaks the hash.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = sample_frames(payloads)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


@register(
    "q_media_embed",
    oracle=f"""
        WITH chars AS (
          SELECT doc_id, ascii(c) // 16 AS bucket
          FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
          WHERE c <> ''
        ),
        counts AS (SELECT doc_id, bucket, count(*) AS n FROM chars GROUP BY 1, 2),
        grid AS (
          SELECT d.doc_id, r.range AS bucket FROM documents d, range({EMBED_DIM}) r
        )
        SELECT g.doc_id,
               string_agg(CAST(COALESCE(c.n, 0) AS VARCHAR), ',' ORDER BY g.bucket) AS embedding_csv
        FROM grid g LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.bucket = g.bucket
        GROUP BY g.doc_id
        """,
    tags=("multimodal", "pandas-udf", "embeddings"),
)
def q_media_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media -> vector bridge: byte-histogram embeddings out of mapInPandas.

    The handoff from the binary column to the similarity stack: payloads
    stream through Arrow, the UDF emits an ARRAY column (a real model would
    emit float activations), and the result joins/kNNs like the embeddings
    table. Serialized to CSV for the oracle comparison only — downstream
    consumers use the array column.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    emb = media_embedding(payloads)
    return emb.select(
        "doc_id", F.array_join("embedding", ",").alias("embedding_csv")
    )


@register(
    "q_media_resize",
    oracle=f"""
        WITH dims AS (
          SELECT doc_id, text, length(text) AS n,
                 CAST(ceil(sqrt(length(text))) AS BIGINT) AS in_w
          FROM documents
        ),
        d2 AS (
          SELECT *, CAST(ceil(CAST(n AS DOUBLE) / in_w) AS BIGINT) AS in_h FROM dims
        ),
        px AS (
          SELECT doc_id, text, n, p.range AS pix,
                 least(((p.range // {RESIZE_W}) * in_h // {RESIZE_H}) * in_w
                         + ((p.range % {RESIZE_W}) * in_w // {RESIZE_W}),
                       n - 1) AS idx
          FROM d2, range({RESIZE_W * RESIZE_H}) p
        )
        SELECT doc_id,
               CAST({RESIZE_W} AS INTEGER) AS width,
               CAST({RESIZE_H} AS INTEGER) AS height,
               md5(string_agg(substr(text, CAST(idx + 1 AS INTEGER), 1), '' ORDER BY pix))
                 AS pixels_md5
        FROM px
        GROUP BY doc_id
        """,
    tags=("multimodal", "pandas-udf", "resize"),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor media resize: fixed 8x8 thumbnail per payload.

    Completes the decode/feature/resize/frame-sample stage set: the oracle
    recomputes every output pixel's clamped source index with integer
    arithmetic over the ASCII payload and must agree on the md5 of the
    resampled bytes — any off-by-one in the resampling or Arrow binary
    round-trip breaks the hash.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    thumbs = resize_media(payloads)
    return thumbs.select("doc_id", "width", "height", F.md5("pixels").alias("pixels_md5"))
