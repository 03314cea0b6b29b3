"""Skew-mitigation primitives: salted aggregation and salted joins.

AQE's skew-join splitting handles most shuffle skew at runtime, but two
shapes still need explicit salting at 100 TB:

- high-cardinality aggregation where ONE key dominates (a viral document
  hash, the empty-string bucket): two-phase salted aggregation spreads the
  hot key across `salt` partial groups, then merges;
- broadcast-ineligible joins against a skewed build side.

These helpers keep the pattern declarative — deterministic salt from a
uniform column (never rand(): results must be reproducible re-run to re-run).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: Column,
    n_salts: int = 16,
    agg_alias: str = "n",
) -> DataFrame:
    """Two-phase COUNT(*) per key, skew-proof.

    Phase 1 groups by (key, salt(row)) so a hot key's rows land in n_salts
    different reducers; phase 2 merges the partial counts. The salt derives
    from a uniform existing column (row id, hash) — deterministic, unlike
    rand()-based salting.
    """
    salted = df.withColumn("_salt", (salt_col % n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(agg_alias))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: Column,
    partials: Callable[[], list[Column]],
    merges: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """General two-phase aggregation: ``partials()`` aggregates within
    (key, salt); ``merges()`` combines the partials per key. The caller picks
    decomposable aggregates (sum/count/min/max — not avg directly)."""
    salted = df.withColumn("_salt", (salt_col % n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partials())
    return partial.groupBy(*keys).agg(*merges())
