"""The fast (double) and parity (decimal) cosine paths must find the same
neighbors — they differ only in final-ulp cosine values."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.operators.vectors import cosine_topk

from .conftest import SF_DIR


def test_fast_path_matches_parity_neighbors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    exact = cosine_topk(emb, pred, k=3, parity=True).collect()
    fast = cosine_topk(emb, pred, k=3, parity=False).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    assert by_query(exact) == by_query(fast)
    # cosines agree to within accumulated rounding of a 64-term double sum
    fast_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in fast}
    for r in exact:
        assert abs(fast_map[(r["query_id"], r["neighbor_id"])] - r["cosine"]) < 1e-9
