"""Per-query profiler: wall + Spark job/stage/task counts via statusTracker.

Usage: python scratch/profile_query.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).

For each query: one warm run (plan/codegen absorbed), then a measured run
wrapped in a job group so the tracker attributes exactly its jobs. Reports
wall seconds, #jobs, #stages, #tasks — at sf0.1 data is ~17MB, so wall is
usually job-count * scheduler floor + stage fan-out; this separates
"too many sequential jobs" from "one expensive stage".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from iceberg_benchmark_poc_spark.core.registry import all_queries
    from iceberg_benchmark_poc_spark.core.session import get_spark

    names = sys.argv[1:]
    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if not names:
        names = sorted(queries)
    # warmup the session once
    queries["q_skip_rate"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # fixed-work yardstick (same as bench.py's parallel probe): divides out
    # host contention so walls are comparable across profiling sessions
    t0 = time.perf_counter()
    spark.range(0, 32 * 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)").collect()
    yard = (time.perf_counter() - t0) * 1000
    print(f"yardstick jvm_fold_x32_ms={yard:.0f} (committed snapshot: 338.8)")

    st = spark.sparkContext.statusTracker()
    print(f"{'query':28s} {'wall_s':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        fn = queries[name].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        walls = []
        for i in range(3):
            group = f"prof_{name}_{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            spark.sparkContext.setJobGroup(None, None)
            spark.catalog.clearCache()
        wall = sorted(walls)[1]
        job_ids = st.getJobIdsForGroup(f"prof_{name}_2")
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        print(f"{name:28s} {wall:7.2f} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
