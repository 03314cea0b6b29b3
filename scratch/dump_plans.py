"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python scratch/dump_plans.py <tag> q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_DIR (default plans/r11).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r11")


def main() -> None:
    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = queries[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
