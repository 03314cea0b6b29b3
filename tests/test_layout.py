"""Bucketed co-located joins eliminate the shuffle; sorted writes produce
prunable row-group ranges."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.core.layout import colocated_join, write_bucketed, write_sorted

from .conftest import SF_DIR


def _plan(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
        write_bucketed(o, "o_bucketed", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
        joined = colocated_join(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
        assert "Exchange" not in _plan(joined)  # zero shuffles
        # and the result is identical to the shuffled join
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()

        unbucketed = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "Exchange" in _plan(unbucketed)  # the baseline does shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_sorted_write_narrows_rowgroup_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    li = load_table(spark, SF_DIR, "lineitem").repartition(4)
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    write_sorted(li, sorted_path, ["l_shipdate"])
    li.write.mode("overwrite").parquet(unsorted_path)

    def total_span(path):
        import os

        span = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index("l_shipdate")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                span += (st.max - st.min).total_seconds()
        return span

    # per-file shipdate ranges must be (weakly) narrower under the sorted layout
    assert total_span(sorted_path) <= total_span(unsorted_path)


def test_zorder_prunes_both_dimensions(spark):
    """Linear sort cannot skip hour-only probes; z-order skips on both dims
    and wins the combined (date AND hour) family.

    Runs at sf0.01: the combined-family crossover needs enough row groups
    (~150) for each z-curve segment to cover a compact 2-D rectangle; at
    sf0.001 there are only 15 segments and linear still wins combined.
    """
    from iceberg_benchmark_poc_spark.queries.zorder import q_zorder

    rows = {
        (r["layout"], r["family"]): r["skip_rate"]
        for r in q_zorder(spark, "/root/testdata/sf0.01").collect()
    }
    hour_family = "hour4"
    combo_family = "date180_hour4"
    assert rows[("linear", hour_family)] == 0.0
    assert rows[("zorder", hour_family)] > 0.5
    assert rows[("zorder", combo_family)] > rows[("linear", combo_family)]
