"""Oracle-gated exercise of the DV payload codec.

The encode half is byte-level Python (zlib is not SQL-expressible), so the
oracle instead checks the DECODED result: positions survive the
encode->compress->decompress->decode roundtrip exactly. Statistics of the
roundtripped set (count/min/max/sum) are computed from the same generator
formula on the DuckDB side — any codec corruption breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.fixtures import dv_entries, with_fixtures
from ..core.registry import register
from ..operators.dv_payload import decode_positions_udf, encode_positions_udf

SAMPLE_MOD = 100  # files with file_id % 100 == 0 get a modeled payload
ROWS_PER_FILE = 1000


@register(
    "q_dv_payload_roundtrip",
    oracle=with_fixtures(
        f"""
        WITH deleted AS (
          SELECT DISTINCT d.file_id,
                 (d.file_id * 17 + j.range * 13) % {ROWS_PER_FILE} AS pos
          FROM dv_entries d, range(1000) j
          WHERE d.file_id % {SAMPLE_MOD} = 0 AND j.range < d.deleted_row_count
        )
        SELECT file_id,
               count(*)              AS n_deleted,
               CAST(min(pos) AS BIGINT) AS min_pos,
               CAST(max(pos) AS BIGINT) AS max_pos,
               CAST(sum(pos) AS BIGINT) AS pos_sum
        FROM deleted
        GROUP BY file_id
        """,
        "dv_entries",
    ),
    tags=("dv", "binary", "pandas-udf"),
)
def q_dv_payload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode delete positions to compressed blobs, decode, and aggregate.

    Pipeline: per-file position sets -> encode_positions_udf (delta+varint+
    zlib BinaryType blob) -> decode_positions_udf -> explode -> stats. The
    oracle recomputes the stats from the generator formula, so a single
    corrupted bit anywhere in the byte path fails the value hash. Blobs are
    built and unpacked executor-side in Arrow batches; the shuffle carries
    one blob per file, never raw positions.
    """
    dv = dv_entries(spark, sf_dir).filter(F.col("file_id") % SAMPLE_MOD == 0)
    positions = (
        dv.select(
            "file_id",
            F.explode(F.sequence(F.lit(0), F.col("deleted_row_count") - 1)).alias("j"),
        )
        .select("file_id", ((F.col("file_id") * 17 + F.col("j") * 13) % ROWS_PER_FILE).alias("pos"))
        .distinct()
        .groupBy("file_id")
        .agg(F.collect_list("pos").alias("positions"))
    )
    blobs = positions.select("file_id", encode_positions_udf("positions").alias("payload"))
    decoded = blobs.select("file_id", F.explode(decode_positions_udf("payload")).alias("pos"))
    return decoded.groupBy("file_id").agg(
        F.count("*").alias("n_deleted"),
        F.min("pos").cast("bigint").alias("min_pos"),
        F.max("pos").cast("bigint").alias("max_pos"),
        F.sum("pos").cast("bigint").alias("pos_sum"),
    )
