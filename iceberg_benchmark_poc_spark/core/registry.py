"""Query registry: one entry per operator from SURVEY.md §2 (plus extensions).

Each registered query is a pair:
  - ``fn(spark, sf_dir) -> DataFrame`` — the idiomatic Spark implementation;
  - ``oracle`` — an equivalent DuckDB SQL string over the same parquet tables
    (views: region nation customer supplier part orders lineitem events
    documents embeddings), or None for genuinely non-SQL-expressible ops.

The driver executes both at sf=0.01 and compares row count + schema +
order-insensitive value hash, so implementations follow the parity rules
established in core/fixtures.py (deterministic modular arithmetic, decimal
folds for float aggregation, identical column aliases on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as the Spark implementation of ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import side-effect: populate REGISTRY
    from iceberg_benchmark_poc_spark import queries as _  # noqa: F401

    return dict(REGISTRY)


def get_query(name: str) -> Query:
    return all_queries()[name]


def driver_ordered_queries() -> dict[str, Query]:
    """Registry round-robined across source modules.

    The correctness driver sweeps ``queries()`` in dict order under a wall
    budget; round 1 stopped at 50 of 85, leaving whole families (embeddings,
    multimodal, streaming) unverdicted because registration order grouped by
    module. Interleaving one-per-module means any truncated prefix still
    samples every operator family.
    """
    qs = all_queries()
    by_module: dict[str, list[Query]] = {}
    for q in qs.values():
        by_module.setdefault(q.fn.__module__, []).append(q)
    out: dict[str, Query] = {}
    rows = list(by_module.values())
    i = 0
    while len(out) < len(qs):
        for mod_queries in rows:
            if i < len(mod_queries):
                q = mod_queries[i]
                out[q.name] = q
        i += 1
    return out
