"""Distributed text-dedup primitives: shingles, minhash-LSH, simhash.

Design for 100 TB of documents:
- Everything is expression-level (whole-stage codegen) — no Python UDFs in
  the hot path. The only "hash function" is md5 (JVM intrinsic), folded to a
  60-bit integer, identical on the DuckDB oracle side.
- The shingle explosion is the dominant cost; it is embarrassingly parallel
  and feeds a (doc, k) -> min aggregation that combines map-side, so the
  shuffle carries one row per (doc, hash-function), not per shingle.
- LSH banding turns near-dup search from O(n^2) pairs into a self-join on
  band buckets; bucket skew (a viral boilerplate string) is handled by AQE
  skew-join splitting, and candidate verification (exact Jaccard) only runs
  on bucket-collision pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.fixtures import hash60

#: Mersenne-ish prime for the affine minhash family (fits comfortably in i64
#: after the 60-bit hash is reduced mod it — no overflow under ANSI mode).
PORTABLE_HASH_PRIME = 1_000_000_007

MINHASH_K = 8  # hash functions per signature
LSH_ROWS_PER_BAND = 2  # => 4 bands; P(candidate) = 1-(1-j^2)^4 for jaccard j
SHINGLE_WORDS = 3  # word trigram shingles


def word_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode documents into distinct word-trigram shingles.

    Output: (doc_id, shingle STRING, h BIGINT) where h is the portable 60-bit
    hash reduced mod PORTABLE_HASH_PRIME. Documents with < 3 words produce a
    single whole-text shingle so every doc has a non-empty shingle set.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    trigrams = F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_WORDS - 1)),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    shingle_arr = F.when(n >= SHINGLE_WORDS, trigrams).otherwise(F.array(F.trim(F.col(text_col))))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingle_arr).alias("shingle"))
        .distinct()
        .withColumn("h", hash60(F.col("shingle")) % PORTABLE_HASH_PRIME)
    )


def minhash_signatures(shingles: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Minhash signature rows: (doc_id, k INT, minhash BIGINT).

    Hash family h_k(x) = ((2k+3)*x + 5k+7) mod P — deterministic, portable,
    overflow-safe. The groupBy combines map-side: shuffle volume is
    O(docs * k), independent of shingle count.
    """
    ks = shingles.sparkSession.range(k).select(F.col("id").cast("int").alias("k"))
    return (
        shingles.crossJoin(F.broadcast(ks))
        .select(
            "doc_id",
            "k",
            (
                ((F.col("k") * 2 + 3) * F.col("h") + (F.col("k") * 5 + 7)) % PORTABLE_HASH_PRIME
            ).alias("hk"),
        )
        .groupBy("doc_id", "k")
        .agg(F.min("hk").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, rows_per_band: int = LSH_ROWS_PER_BAND) -> DataFrame:
    """Candidate near-dup pairs from banded minhash signatures.

    Docs collide when an entire band of their signatures matches. Output:
    distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    bands = (
        signatures.withColumn("band", F.floor(F.col("k") / rows_per_band))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws(":", F.sort_array(F.collect_list(F.concat_ws("=", F.col("k"), F.col("minhash"))))).alias("band_sig"))
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_for_pairs(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Joins each side's shingle set and counts intersection; union =
    |A| + |B| - inter. Only candidate pairs pay this cost.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(a, "doc_a")
        .join(b.withColumn("matched", F.lit(1)), ["doc_b", "shingle"], "left")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("matched").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))).alias("jaccard"),
        )
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit simhash signature per document: (doc_id, simhash BIGINT).

    Distinct words vote +1/-1 per bit of their 60-bit hash; the signature
    packs the per-bit majority signs. Near-dup docs differ in few bits
    (compare via hamming distance over bitwise XOR downstream).
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .withColumn("h", hash60(F.col("w")))
    )
    bits = spark.range(16).select(F.col("id").cast("int").alias("b"))
    votes = (
        words.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "b",
            # shiftright() only takes a literal shift in the Python API; the SQL
            # form accepts a column
            (F.expr("shiftright(h, b)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(0))
        .cast("bigint")
        .alias("simhash")
    )
