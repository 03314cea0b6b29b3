"""Interleaved A/B: hash-repartition spread of the single-split documents
scan before CPU-heavy per-row work (keyed exchange — no SPARK-23207 local
sort, unlike the r11 round-robin attempt that measured 1.7x WORSE).

Variants are built by monkeypatching _docs/load_table consumers minimally:
we wrap the registered query fns with a conf-driven spread via
iceberg_benchmark_poc_spark.core.io.SPREAD override.

Usage: python scratch/ab_spread_scan.py [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QS = [
    "q_simhash",
    "q_video_features",
    "q_media_embed",
    "q_audio_features",
    "q_frame_sample",
    "q_lm_score",
]


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark
    from iceberg_benchmark_poc_spark.core import io as core_io

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="ab_spread_scan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    orig_load = core_io.load_table
    state = {"spread": False}

    def load_spread(spark_, sf_dir, name):
        df = orig_load(spark_, sf_dir, name)
        if state["spread"] and name == "documents":
            target = spark_.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() * 2 <= target:
                df = df.repartition(target, "doc_id")
        return df

    core_io.load_table = load_spread
    # queries imported load_table by name at module import — patch those refs
    import iceberg_benchmark_poc_spark.queries as qpkg
    patched = []
    for modname in dir(qpkg):
        mod = getattr(qpkg, modname)
        if hasattr(mod, "load_table"):
            patched.append(mod)
            mod.load_table = load_spread
    import iceberg_benchmark_poc_spark.queries.textpipe as tp
    if hasattr(tp, "load_table"):
        tp.load_table = load_spread
    print(f"patched {len(patched)} query modules")

    for n in QS:
        queries[n].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    walls: dict[tuple[str, str], list[float]] = {}
    for r in range(rounds):
        order = ("base", "spread") if r % 2 == 0 else ("spread", "base")
        for variant in order:
            state["spread"] = variant == "spread"
            for n in QS:
                spark.sparkContext.setJobDescription(f"{n}:{variant}")
                w = timed(queries[n].fn(spark, SF_DIR))
                walls.setdefault((n, variant), []).append(w)
                spark.catalog.clearCache()

    print(f"{'query':25s} {'base_med':>9s} {'spread_med':>10s} {'speedup':>8s}")
    tb = ts = 0.0
    for n in QS:
        mb = statistics.median(walls[(n, "base")])
        ms = statistics.median(walls[(n, "spread")])
        tb += mb
        ts += ms
        print(f"{n:25s} {mb:9.3f} {ms:10.3f} {mb / ms:8.2f}x")
    print(f"{'TOTAL(medians)':25s} {tb:9.3f} {ts:10.3f} {tb / ts:8.2f}x")


if __name__ == "__main__":
    main()
