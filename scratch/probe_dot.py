import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]").appName("probe2")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
con = duckdb.connect()

s = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
    "vec_id",
    "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double)*cast(y as double)), cast(0 as decimal(30,12)), (acc, z) -> cast(acc + cast(z as decimal(30,12)) as decimal(30,12))) v"
).toPandas().set_index("vec_id")["v"].to_dict()
d = dict(con.sql("""
 select vec_id, SUM(CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(30,12))) v
 from (select vec_id, unnest(list_zip(embedding, embedding)) z from read_parquet('/root/testdata/sf0.001/embeddings.parquet')) t(vec_id, z)
 group by vec_id
""").fetchall())
diffs = [(k, s[k], d[k]) for k in s if s[k] != d[k]]
print("n =", len(s), "diffs =", len(diffs), diffs[:5])
spark.stop()
