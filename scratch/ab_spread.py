"""Interleaved A/B: post-shuffle parallelism experiments at sf0.1.

B: spark.sql.adaptive.coalescePartitions.minPartitionSize (runtime conf)
   1m (default) vs small — AQE coalesces 17MB shuffles to 1-2 partitions,
   serializing CPU-heavy downstream stages (shingle/minhash/array_intersect).
A: hash-repartition spread of a narrow scan before CPU-heavy per-row work
   (q_simhash) — keyed exchange, no SPARK-23207 local sort.

Usage: python scratch/ab_spread.py [n_rounds] [q ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MINSIZE = os.environ.get("AB_MINSIZE", "256k")

DEFAULT_QS = [
    "q_simhash",
    "q_simhash_pairs",
    "q_containment",
    "q_minhash_dedup",
    "q_dup_clusters",
    "q_jaccard_neighbors",
    "q_embed_neardup",
    "q_khop",
    "q_assoc_rules",
    # cheap controls — catch scheduler-overhead regressions
    "q_pricing_summary",
    "q_top_parts",
    "q_dedup_exact",
]


def timed(spark, df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT_QS
    spark = get_spark(app_name="ab_spread")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    conf_key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    base = spark.conf.get(conf_key, "1m")
    print(f"baseline {conf_key}={base}, variant={MINSIZE}")

    # warm
    for n in names:
        queries[n].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    walls: dict[tuple[str, str], list[float]] = {}
    for r in range(rounds):
        for variant in ("base", "small") if r % 2 == 0 else ("small", "base"):
            spark.conf.set(conf_key, base if variant == "base" else MINSIZE)
            for n in names:
                spark.sparkContext.setJobDescription(f"{n}:{variant}")
                w = timed(spark, queries[n].fn(spark, SF_DIR))
                walls.setdefault((n, variant), []).append(w)
                spark.catalog.clearCache()
    spark.conf.set(conf_key, base)

    print(f"{'query':30s} {'base_med':>9s} {'small_med':>9s} {'speedup':>8s}")
    tb = ts = 0.0
    for n in names:
        mb = statistics.median(walls[(n, "base")])
        ms = statistics.median(walls[(n, "small")])
        tb += mb
        ts += ms
        print(f"{n:30s} {mb:9.3f} {ms:9.3f} {mb / ms:8.2f}x")
    print(f"{'TOTAL(medians)':30s} {tb:9.3f} {ts:9.3f} {tb / ts:8.2f}x")


if __name__ == "__main__":
    main()
