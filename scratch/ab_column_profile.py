"""A/B q_column_profile forms (VERDICT r11 #7): Expand-based multi-distinct
vs melt + two-level exact distinct. Interleaved medians, results compared
for equality first.

Usage: python scratch/ab_column_profile.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def melt_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_benchmark_poc_spark.core.io import load_table
    from iceberg_benchmark_poc_spark.queries.analytic import PROFILE_COLS

    cents = {c: F.floor(F.col(c) * 100).cast("bigint") for c in PROFILE_COLS}
    li = load_table(spark, sf_dir, "lineitem").select(
        *[cents[c].alias(c) for c in PROFILE_COLS]
    )
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("col_name"), F.col(c).alias("v"))
                    for c in PROFILE_COLS
                ]
            )
        ).alias("x")
    ).select("x.col_name", "x.v")
    hist = melted.groupBy("col_name", "v").agg(F.count("*").alias("c"))
    return hist.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("v").isNotNull(), F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_nonnull"),
        F.count("v").cast("bigint").alias("n_distinct"),
        F.min("v").alias("min_cents"),
        F.max("v").alias("max_cents"),
    )


def expand_form(spark, sf_dir):
    from iceberg_benchmark_poc_spark.core.registry import all_queries

    return all_queries()["q_column_profile"].fn(spark, sf_dir)


def main() -> None:
    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab_colprof")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()["q_skip_rate"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    a = {tuple(r) for r in expand_form(spark, SF_DIR).collect()}
    b = {(r["col_name"], r["n_rows"], r["n_nonnull"], r["n_distinct"], r["min_cents"], r["max_cents"]) for r in melt_form(spark, SF_DIR).collect()}
    print("results equal:", a == b)

    variants = {"expand": expand_form, "melt": melt_form}
    for fn in variants.values():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    spark.range(0, 32 * 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)").collect()
    print(f"yardstick x32 {1000*(time.perf_counter()-t0):.0f} ms (snapshot 338.8)")
    walls = {k: [] for k in variants}
    for _ in range(n_rounds):
        for k, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls[k].append(time.perf_counter() - t0)
    for k, ws in walls.items():
        print(f"{k:8s} median={sorted(ws)[len(ws)//2]:.2f} all={[round(w,2) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
