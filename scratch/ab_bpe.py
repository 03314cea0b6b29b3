"""A/B the q_bpe_train ingredients (VERDICT r11 #1): persist vs
localCheckpoint on the type dictionary, AQE off vs on for the argmax
collects, coalesce width. Interleaved rounds so host drift cancels.

Usage: python scratch/ab_bpe.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_variant(spark, cut: str, aqe: str, width: int) -> float:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from iceberg_benchmark_poc_spark.queries.bpe import BPE_MERGES, _best_pair, _word_types

    t0 = time.perf_counter()
    words = _word_types(spark, SF_DIR)
    if width:
        words = words.coalesce(width)
    if cut == "persist":
        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    elif cut == "ckpt":
        words = words.localCheckpoint(eager=False)
    aqe_key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(aqe_key)
    spark.conf.set(aqe_key, aqe)
    try:
        for _ in range(BPE_MERGES):
            row = _best_pair(words).collect()[0]
            pair = row["pair"]
            if pair is None:
                break
            doubled_pair = " " + pair.replace(" ", "  ") + " "
            merged_pad = " " + pair.replace(" ", "") + " "
            padded = F.concat(
                F.lit(" "), F.replace(F.col("seq"), F.lit(" "), F.lit("  ")), F.lit(" ")
            )
            rewritten = F.replace(
                F.trim(F.replace(padded, F.lit(doubled_pair), F.lit(merged_pad))),
                F.lit("  "),
                F.lit(" "),
            )
            words = words.select(rewritten.alias("seq"), "weight")
    finally:
        spark.conf.set(aqe_key, old)
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    return wall


def main() -> None:
    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab_bpe")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()["q_skip_rate"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    variants = [
        ("persist", "false", 8),   # committed r11 form
        ("ckpt", "false", 8),      # r10-style cut
        ("persist", "true", 8),    # AQE back on
        ("persist", "false", 0),   # no coalesce
        ("none", "false", 8),      # no cut at all (re-derive per round)
    ]
    # warm each once
    for v in variants:
        run_variant(spark, *v)
    t0 = time.perf_counter()
    spark.range(0, 32 * 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)").collect()
    print(f"yardstick x32 {1000*(time.perf_counter()-t0):.0f} ms (snapshot 338.8)")
    walls: dict[tuple, list[float]] = {v: [] for v in variants}
    for _ in range(n_rounds):
        for v in variants:
            walls[v].append(run_variant(spark, *v))
    for v, ws in walls.items():
        med = sorted(ws)[len(ws) // 2]
        print(f"cut={v[0]:8s} aqe={v[1]:5s} width={v[2]} median={med:.2f} all={[round(w,2) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
