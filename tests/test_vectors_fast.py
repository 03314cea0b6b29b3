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
    # cosines agree to within the 2^-20 fixed-point quantization error
    fast_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in fast}
    for r in exact:
        assert abs(fast_map[(r["query_id"], r["neighbor_id"])] - r["cosine"]) < 1e-5


def test_neardup_precision_and_recall(spark):
    """q_embed_neardup's LSH candidates are a true subset of the brute-force
    pair set (precision 1.0 — candidates are exact-verified) with non-trivial
    recall on the near-orthogonal synthetic vectors."""
    import numpy as np

    from iceberg_benchmark_poc_spark.queries.embeddings import (
        NEARDUP_THRESHOLD,
        q_embed_neardup,
    )

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = Mn @ Mn.T
    iu = np.triu_indices(len(ids), k=1)
    hit = cos[iu] >= NEARDUP_THRESHOLD
    true_dups = {int(d) for d in ids[iu[1][hit]]}  # larger-id member of each pair
    # membership check uses a slightly relaxed floor: the query scores 2^-20
    # quantized vectors, so a pair within ~1e-5 of the threshold may qualify
    # there but not on the exact cosine
    near = cos[iu] >= NEARDUP_THRESHOLD - 1e-4
    true_pairs = {
        (int(ids[i]), int(ids[j])) for i, j in zip(iu[0][near], iu[1][near])
    }

    reported = q_embed_neardup(spark, SF_DIR).collect()
    assert reported, "neardup query found nothing at test scale"
    for r in reported:
        assert (r["dup_of"], r["vec_id"]) in true_pairs  # precision 1.0
        assert r["cosine"] >= NEARDUP_THRESHOLD
    recall = len({r["vec_id"] for r in reported}) / len(true_dups)
    # 3 OR-combined sign-LSH bands at a sub-dup threshold (0.44 measured);
    # true duplicates (cosine ~1) would collide in nearly every band
    assert recall >= 0.3


def test_ivf_assignment_and_recall(spark):
    """q_ivf_topk probes each query's NPROBE nearest cells: every reported
    neighbor is indexed (rank-1 assignment) in one of the query's probe
    cells, per-query results are valid top-k subsets, and rank-1 recall vs
    the brute-force baseline is non-trivial."""
    import numpy as np

    from iceberg_benchmark_poc_spark.queries.embeddings import (
        NPROBE,
        QUERY_MOD,
        TOP_K,
        q_embed_topk,
        q_ivf_topk,
    )

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    # nearest per-label centroid assignment, the reference model
    lbs = sorted(set(labels))
    cents = np.array([M[labels == lb].mean(axis=0) for lb in lbs])
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = Mn @ cn.T
    assign = {int(i): int(lbs[c]) for i, c in zip(ids, sims.argmax(axis=1))}
    probes = {
        int(i): {int(lbs[c]) for c in row.argsort()[::-1][:NPROBE]}
        for i, row in zip(ids, sims)
    }

    reported = q_ivf_topk(spark, SF_DIR).collect()
    assert reported
    per_query = {}
    for r in reported:
        per_query.setdefault(r["query_id"], []).append(r)
        # the probed cell is one of the query's NPROBE nearest, and the
        # neighbor is indexed there (one-cell index, multi-cell probe)
        assert r["cell"] in probes[r["query_id"]]
        assert assign[r["neighbor_id"]] == r["cell"]
    for q, rs in per_query.items():
        assert len(rs) <= TOP_K
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))

    # rank-1 recall vs brute force: the true nearest neighbor lands in the
    # query's own cell often enough to be found by a single-cell probe
    brute = {r["query_id"]: r["neighbor_id"] for r in q_embed_topk(spark, SF_DIR).collect() if r["rank"] == 1}
    ivf1 = {r["query_id"]: r["neighbor_id"] for r in reported if r["rank"] == 1}
    hits = sum(1 for q, n in brute.items() if ivf1.get(q) == n)
    assert hits / len(brute) >= 0.2


def test_neardup_class_rows_under_duplication(spark, tmp_path):
    """Duplicating every vector d times must not change the cross-class
    links (candidates are a function of DISTINCT vectors) and must emit one
    (rep, rep, 1.0, d) self row per class — the closed form for the d-1
    copies that fold into their representative."""
    from iceberg_benchmark_poc_spark.queries.embeddings import q_embed_neardup

    base = q_embed_neardup(spark, SF_DIR).collect()
    assert all(r["n_copies"] == 1 for r in base), "fixture vectors are distinct"

    d = 3
    emb = load_table(spark, SF_DIR, "embeddings")
    n_vecs = emb.count()
    copies = emb
    for i in range(1, d):
        copies = copies.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    dup_dir = tmp_path / "dup"
    copies.write.parquet(str(dup_dir / "embeddings.parquet"))

    rows = q_embed_neardup(spark, str(dup_dir)).collect()
    self_rows = [r for r in rows if r["vec_id"] == r["dup_of"] and r["cosine"] == 1.0]
    cross = {(r["vec_id"], r["dup_of"], round(r["cosine"], 9)) for r in rows
             if not (r["vec_id"] == r["dup_of"] and r["cosine"] == 1.0)}
    # every one of the n_vecs classes got exactly one self row with size d
    assert len(self_rows) == n_vecs
    assert all(r["n_copies"] == d for r in self_rows)
    # min-id representatives are the original vec_ids, so the cross links
    # are IDENTICAL to the unduplicated run (just annotated with n_copies=d)
    expect_cross = {(r["vec_id"], r["dup_of"], round(r["cosine"], 9)) for r in base}
    assert cross == expect_cross
    assert all(r["n_copies"] == d for r in rows if (r["vec_id"], r["dup_of"], round(r["cosine"], 9)) in cross)


def test_int8_quantization_error_bound_and_recall(spark):
    """Int8 symmetric quantization must (a) bound per-element reconstruction
    error by amax/254 (half a quantization step), (b) hit +/-127 exactly at
    the extreme element, and (c) preserve top-k neighbors well enough that
    rank-1 recall vs the exact float baseline is high on the synthetic
    corpus — the property that makes the 4x-smaller serving path usable."""
    from iceberg_benchmark_poc_spark.queries.embeddings import (
        TOP_K,
        q_ann_int8,
        q_embed_quantize,
        q_embed_topk,
    )

    FP30 = float(1 << 30)
    rows = q_embed_quantize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        amax = r["amax_fp"] / FP30
        assert r["q_absmax"] == 127  # extreme element quantizes exactly
        # err <= amax/254 + fixed-point slack
        assert r["err_fp"] / FP30 <= amax / 254 + 2 / FP30

    exact = q_embed_topk(spark, SF_DIR).collect()
    q8 = q_ann_int8(spark, SF_DIR).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in exact if r["rank"] == 1}
    top1_q8 = {r["query_id"]: r["neighbor_id"] for r in q8 if r["rank"] == 1}
    assert set(top1) == set(top1_q8)
    hit = sum(top1[q] == top1_q8[q] for q in top1)
    assert hit / len(top1) >= 0.8, f"rank-1 recall {hit}/{len(top1)}"
    # every query returns a full, valid top-k
    per_q = {}
    for r in q8:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, TOP_K + 1)) for v in per_q.values())
