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


def _round_robin(queries: list[Query]) -> list[Query]:
    """Interleave one-per-module so a truncated prefix samples every family."""
    by_module: dict[str, list[Query]] = {}
    for q in queries:
        by_module.setdefault(q.fn.__module__, []).append(q)
    out: list[Query] = []
    rows = list(by_module.values())
    i = 0
    while len(out) < len(queries):
        for mod_queries in rows:
            if i < len(mod_queries):
                out.append(mod_queries[i])
        i += 1
    return out


def _verification_history() -> dict[str, int]:
    """name -> round of the most recent GREEN driver verdict.

    Parsed from the committed ``CORRECTNESS_r*.json`` files at the repo root.
    A row is green when the driver recorded no error, the row counts matched,
    and the value hash did not mismatch (hash_match is null for oracle-less
    rows-only checks — that still counts as green; an explicit False does
    not). Queries absent from the map have never had a green driver row.
    """
    import json
    import re
    from pathlib import Path

    last_green: dict[str, int] = {}
    try:
        root = Path(__file__).resolve().parents[2]
        for path in sorted(root.glob("CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", path.name)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                rows = json.loads(path.read_text())
            except (OSError, ValueError):
                continue
            if not isinstance(rows, dict):
                continue
            for name, row in rows.items():
                if not isinstance(row, dict):
                    continue
                green = (
                    row.get("err") is None
                    and bool(row.get("rows_match"))
                    and bool(row.get("schema_match"))
                    and row.get("hash_match") is not False
                )
                if green:
                    last_green[name] = max(last_green.get(name, 0), rnd)
    except Exception:  # noqa: BLE001 — ordering is best-effort, never fatal
        return {}
    return last_green


def driver_ordered_queries() -> dict[str, Query]:
    """Registry ordered so a wall-budget-truncated sweep maximizes coverage.

    The correctness driver sweeps ``queries()`` in dict order under a wall
    budget that covers roughly half the registry per round. Static orders
    re-check the same prefix every round, so queries outside it are never
    verified. Instead, order by verification debt using the committed
    CORRECTNESS_r*.json history:

    1. never-green queries first (never swept, or swept and errored) —
       round-robined across modules so the prefix still samples families;
    2. then green queries, oldest green round first (stalest re-verified
       before fresh ones), also round-robined within each round cohort.

    This is self-maintaining: each round's results file re-sorts the next
    round's sweep, so every query converges to a recent green row.
    """
    qs = all_queries()
    last_green = _verification_history()
    never: list[Query] = [q for q in qs.values() if q.name not in last_green]
    greens: list[Query] = [q for q in qs.values() if q.name in last_green]
    cohorts: dict[int, list[Query]] = {}
    for q in greens:
        cohorts.setdefault(last_green[q.name], []).append(q)
    ordered: list[Query] = _round_robin(never)
    for rnd in sorted(cohorts):
        ordered.extend(_round_robin(cohorts[rnd]))
    return {q.name: q for q in ordered}
