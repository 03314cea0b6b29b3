"""PySpark-native analytics engine with the query and data-processing
capabilities of vaquarkhan/iceberg-benchmark-poc.

The reference (at /root/reference, see SURVEY.md) is a single-process Python
benchmark suite for Iceberg V4 metadata management: scan planning, delete-vector
resolution joins, manifest-tree traversal, commit latency, compaction, and
stats-based pruning. This package re-expresses every one of those workloads as
declarative Spark DataFrame / SQL plans so that Catalyst + Tungsten + AQE pick
the physical strategy, and adds the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing) a
100 TB deployment needs.

Layout:
    core/       SparkSession factory, table IO, fixture builders, query registry
    queries/    every correctness-gated query (Spark impl + DuckDB oracle twin)
    operators/  reusable distributed building blocks (minhash, cosine top-k, ...)
    streaming/  Structured Streaming ports of the commit/ingest workloads
    bench/      benchmark harness mirroring the reference's 11 suites
"""

__version__ = "0.1.0"
