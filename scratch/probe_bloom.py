"""Probe: does Spark 4.x parquet vectorized read apply bloom-filter row-group
pruning, and can we read rows-scanned from the scan node metrics?"""
import os, time, tempfile

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="bloomprobe")
n_rows, n_files = 5_000_000, 4
fid = F.col("id")
df = spark.range(n_rows).select(
    (fid * 2654435761 % 4_000_000_000).alias("key"), (fid % 97).alias("v")
)
plain, bloom = os.path.join(tmp, "plain"), os.path.join(tmp, "bloom")

(
    df.repartition(n_files)
    .write.mode("overwrite")
    .option("parquet.block.size", str(1 << 20))  # ~1MB row groups
    .parquet(plain)
)
(
    df.repartition(n_files)
    .write.mode("overwrite")
    .option("parquet.block.size", str(1 << 20))
    .option("parquet.bloom.filter.enabled#key", "true")
    .option("parquet.bloom.filter.expected.ndv#key", "400000")
    .parquet(bloom)
)

# inspect row-group structure with pyarrow
import pyarrow.parquet as pq

f = [os.path.join(plain, p) for p in os.listdir(plain) if p.endswith(".parquet")][0]
md = pq.ParquetFile(f).metadata
print("row groups per file:", md.num_row_groups, "rows/rg:", md.row_group(0).num_rows)

probe_key = int(spark.read.parquet(plain).limit(1).collect()[0]["key"])
print("probe key:", probe_key)


def scan_rows(path):
    d = spark.read.parquet(path).filter(F.col("key") == probe_key)
    rows = d.collect()  # no exchange -> plain executed plan with metrics
    ep = d._jdf.queryExecution().executedPlan()
    leaves = ep.collectLeaves()
    scan = leaves.apply(0)
    # scala Map[String, SQLMetric]
    m = scan.metrics()
    out = {}
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return len(rows), out


for name, path in [("plain", plain), ("bloom", bloom)]:
    n, met = scan_rows(path)
    print(name, "result rows:", n, "metrics:", met)


def lookup_ms(path, reps=5):
    d = spark.read.parquet(path).filter(F.col("key") == probe_key)
    d.count()
    t0 = time.perf_counter()
    for _ in range(reps):
        d.count()
    return (time.perf_counter() - t0) / reps * 1000


pm, bm = lookup_ms(plain), lookup_ms(bloom)
print(f"plain {pm:.1f} ms  bloom {bm:.1f} ms  speedup {pm/bm:.2f}x")
spark.stop()
