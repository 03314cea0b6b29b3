import datetime as dt
import json
import os
import shutil
import time
import uuid

from iceberg_benchmark_poc_spark.core.session import get_spark
from iceberg_benchmark_poc_spark.streaming import tumbling_counts

spark = get_spark()
base = "/tmp/dbg_wm"
shutil.rmtree(base, ignore_errors=True)
src = os.path.join(base, "late_src")
os.makedirs(src)


def write_file(name, rows, mtime):
    df = spark.createDataFrame(rows, "ts timestamp, user_id bigint, event_type string, value double")
    path = os.path.join(src, name)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


t = lambda h, m: dt.datetime(2026, 1, 1, h, m)
now = time.time()
write_file("a", [(t(10, 5), 1, "click", 1.0), (t(10, 20), 2, "click", 1.0)], now - 100)
write_file("b", [(t(13, 30), 3, "click", 1.0)], now - 80)
write_file("c", [(t(13, 35), 4, "click", 1.0)], now - 60)
write_file("d", [(t(10, 40), 5, "click", 1.0), (t(13, 40), 6, "click", 1.0)], now - 40)

stream = (
    spark.readStream.schema("ts timestamp, user_id bigint, event_type string, value double")
    .option("maxFilesPerTrigger", 1)
    .parquet(src + "/*")
)
name = f"t_{uuid.uuid4().hex[:8]}"
q = (
    tumbling_counts(stream)
    .writeStream.format("memory")
    .queryName(name)
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
for p in q.recentProgress:
    print(json.dumps({
        "batchId": p["batchId"],
        "numInputRows": p["numInputRows"],
        "eventTime": p.get("eventTime"),
    }))
spark.table(name).show(truncate=False)
