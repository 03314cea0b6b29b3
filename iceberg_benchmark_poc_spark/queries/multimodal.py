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
from ..operators.multimodal import FRAME_BYTES, media_features


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
