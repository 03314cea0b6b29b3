"""Per-query wall-clock at sf0.01 (driver scale), collect-based like the driver."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_benchmark_poc_spark.core.registry import all_queries
from iceberg_benchmark_poc_spark.core.session import get_spark

SF = "/root/testdata/sf0.01"

spark = get_spark(app_name="time_sf001", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
out = {}
for name in qs:
    t0 = time.perf_counter()
    try:
        qs[name].fn(spark, SF).collect()
        out[name] = round(time.perf_counter() - t0, 2)
    except Exception as e:
        out[name] = f"ERR {e}"[:120]
print(json.dumps(out, indent=1))
json.dump(out, open("/tmp/time_sf001.json", "w"), indent=1)
spark.stop()
