"""Invariant tests for the derived-dimension TPC-H band and the
corpus-governance pair (queries/tpch_derived.py, textpipe.py round 8).

The oracle-parity suite already proves engine==DuckDB on every output;
these tests pin the SEMANTIC claims the docstrings make — referential
integrity of the derived partsupp, bounds of the modular columns,
quota/top-K behavior, and the holdout partition property — which parity
alone cannot distinguish from a twin bug in both formulations.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.queries.textpipe import (
    SOURCE_QUOTA_K,
    q_holdout_split,
    q_source_quota,
)
from iceberg_benchmark_poc_spark.queries.tpch_derived import _partsupp


def test_partsupp_referential_integrity_and_bounds(spark):
    """Every derived pair is an observed lineitem pair (and vice versa —
    it IS the distinct pair set), availqty in 1..100, supplycost_cents in
    100..99999, and (partkey, suppkey) is a key (no duplicate pairs)."""
    ps = _partsupp(spark, SF_DIR).collect()
    li_pairs = {
        (r.l_partkey, r.l_suppkey)
        for r in load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    }
    ps_pairs = [(r.ps_partkey, r.ps_suppkey) for r in ps]
    assert set(ps_pairs) == li_pairs
    assert len(ps_pairs) == len(set(ps_pairs)), "duplicate (part, supplier) pair"
    for r in ps:
        assert 1 <= r.ps_availqty <= 100
        assert 100 <= r.ps_supplycost_cents <= 99999
        # the modular definitions themselves
        assert r.ps_availqty == (r.ps_partkey * 17 + r.ps_suppkey * 31) % 100 + 1
        assert r.ps_supplycost_cents == (r.ps_partkey * 7 + r.ps_suppkey * 11) % 99900 + 100


def test_source_quota_keeps_k_longest_per_source(spark):
    """Per source: at most K rows, and they are exactly the K largest by
    (n_chars desc, doc_id asc) — checked against a pandas-free brute force
    over the raw documents table."""
    kept = defaultdict(list)
    for r in q_source_quota(spark, SF_DIR).collect():
        kept[r.source].append((r.doc_id, r.n_chars, r.rk))
    raw = defaultdict(list)
    for r in load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect():
        raw[r.source].append((-r.n_chars, r.doc_id))
    assert set(kept) == set(raw)
    for src, rows in kept.items():
        assert len(rows) == min(SOURCE_QUOTA_K, len(raw[src]))
        expect = sorted(raw[src])[: len(rows)]
        got = sorted((-n, d) for d, n, _ in rows)
        assert got == expect, f"{src}: quota kept the wrong documents"
        ranks = sorted(rk for _, _, rk in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_holdout_split_partitions_and_is_stable(spark):
    """The three splits partition the corpus (counts and char sums fold
    back to the raw totals) and assignment is deterministic across
    separate plan executions."""
    rows1 = {(r.split, r.lang): (r.n_docs, r.sum_chars) for r in q_holdout_split(spark, SF_DIR).collect()}
    rows2 = {(r.split, r.lang): (r.n_docs, r.sum_chars) for r in q_holdout_split(spark, SF_DIR).collect()}
    assert rows1 == rows2, "holdout assignment changed between runs"
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.agg(
        F.count("*").alias("n"), F.sum("n_chars").cast("bigint").alias("s")
    ).first()
    assert sum(v[0] for v in rows1.values()) == total.n
    assert sum(v[1] for v in rows1.values()) == total.s
    assert {s for s, _ in rows1} <= {"train", "valid", "test"}
    # train must dominate under the 90/5/5 gate on any non-trivial corpus
    by_split = defaultdict(int)
    for (s, _), (n, _) in rows1.items():
        by_split[s] += n
    assert by_split["train"] > by_split.get("valid", 0)
    assert by_split["train"] > by_split.get("test", 0)
