import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .appName("probe")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
con = duckdb.connect()
checks = []

s_val = spark.sql("select cast(conv(substr(md5('abc'),1,15),16,10) as bigint) v").first()[0]
d_val = con.sql("select ('0x'||substr(md5('abc'),1,15))::bigint v").fetchone()[0]
checks.append(("md5->bigint", s_val, d_val))

txt = "  the quick  brown fox "
s_val = spark.sql(f"select size(split(trim('{txt}'), '\\\\s+')) v").first()[0]
d_val = con.sql(rf"select len(string_split_regex(trim('{txt}'), '\s+')) v").fetchone()[0]
checks.append(("token count", s_val, d_val))
# empty-string token edge case
s_val2 = spark.sql("select size(split(trim(''), '\\\\s+')) v").first()[0]
d_val2 = con.sql(r"select len(string_split_regex(trim(''), '\s+')) v").fetchone()[0]
checks.append(("token count empty", s_val2, d_val2))

s_val = spark.sql("select date_add(date'2020-01-01', cast(615 as int)) v").first()[0]
d_val = con.sql("select DATE '2020-01-01' + 615 v").fetchone()[0]
checks.append(("date add", s_val, d_val))

s_val = spark.sql("select cast(sum(cast(x as decimal(38,12))) as double) v from values (1.1),(2.2),(3.3) t(x)").first()[0]
d_val = con.sql("select CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) v from (values (1.1),(2.2),(3.3)) t(x)").fetchone()[0]
checks.append(("decimal sum", s_val, d_val))

ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn("ts", F.timestamp_micros((F.col("ts")/1000).cast("long")))
s_val = ev.select(F.date_trunc("hour", "ts").alias("v")).orderBy("v").first()[0]
d_val = con.sql("select CAST(date_trunc('hour', ts) AS TIMESTAMP) v from read_parquet('/root/testdata/sf0.001/events.parquet') order by v limit 1").fetchone()[0]
checks.append(("events ts date_trunc", s_val, d_val))
s_val = ev.select(F.col("ts").alias("v")).orderBy("v").first()[0]
d_val = con.sql("select CAST(ts AS TIMESTAMP) v from read_parquet('/root/testdata/sf0.001/events.parquet') order by v limit 1").fetchone()[0]
checks.append(("events raw ts", s_val, d_val))

s_val = spark.sql("select concat('f_', lpad(cast(42 as string), 8, '0')) v").first()[0]
d_val = con.sql("select 'f_' || lpad(CAST(42 AS VARCHAR), 8, '0') v").fetchone()[0]
checks.append(("lpad", s_val, d_val))

s_val = spark.sql("select cast(cast(1234567 as bigint)*7919 % 1826 as int) v").first()[0]
d_val = con.sql("select CAST(CAST(1234567 AS BIGINT)*7919 % 1826 AS INTEGER) v").fetchone()[0]
checks.append(("mod", s_val, d_val))

s_val = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
    "cast(aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double)*cast(y as double)), cast(0.0 as double), (a, b) -> a + b) as decimal(38,12)) v"
).orderBy("v").first()[0]
d_val = con.sql("""
 select CAST(SUM(CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,12))) AS DECIMAL(38,12)) v
 from (select vec_id, unnest(list_zip(embedding, embedding)) z from read_parquet('/root/testdata/sf0.001/embeddings.parquet')) t(vec_id, z)
 group by vec_id order by v limit 1
""").fetchone()[0]
checks.append(("dot product", s_val, d_val))

# timestamp[ms] lineitem
s_val = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(F.to_date("l_shipdate").alias("v")).orderBy("v").first()[0]
d_val = con.sql("select CAST(l_shipdate AS DATE) v from read_parquet('/root/testdata/sf0.001/lineitem.parquet') order by v limit 1").fetchone()[0]
checks.append(("shipdate to_date", s_val, d_val))

for name, s, d in checks:
    print(("MATCH " if s == d else "DIFF  "), name, "| spark:", repr(s), "| duckdb:", repr(d))
spark.stop()
