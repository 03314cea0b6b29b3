"""Multimodal plumbing: batch-shape contracts and the media -> ANN bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.operators.multimodal import (
    EMBED_DIM,
    FRAME_BYTES,
    media_embedding,
    sample_frames,
)
from iceberg_benchmark_poc_spark.operators.vectors import cosine_topk

from .conftest import SF_DIR


def _payloads(spark):
    d = load_table(spark, SF_DIR, "documents")
    return d.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def test_sample_frames_expands_rows(spark):
    p = _payloads(spark)
    expected = p.select(
        F.sum(F.floor(F.length("payload") / FRAME_BYTES) + 1).cast("bigint")
    ).collect()[0][0]
    frames = sample_frames(p)
    assert frames.count() == expected
    # frames reassemble to the original payload
    rebuilt = (
        frames.groupBy("doc_id")
        .agg(F.sum(F.length("frame")).alias("n"))
        .join(p.select("doc_id", F.length("payload").alias("expected_n")), "doc_id")
        .filter(F.col("n") != F.col("expected_n"))
        .count()
    )
    assert rebuilt == 0


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
        assert sum(r["embedding"]) == len(bytes(p[r["doc_id"]]["payload"]))


def test_resize_identity_on_square_input(spark):
    """Resizing an exactly 8x8 byte raster to 8x8 must return it unchanged
    (nearest-neighbor with matching grids is the identity)."""
    from iceberg_benchmark_poc_spark.operators.multimodal import resize_media

    payload = bytes(range(64))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    [row] = resize_media(df).collect()
    assert (row["width"], row["height"]) == (8, 8)
    assert bytes(row["pixels"]) == payload
