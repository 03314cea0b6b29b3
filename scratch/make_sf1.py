"""Synthesize a deterministic sf1 dataset as a 10x key-shifted scale-up of
/root/testdata/sf0.1, written to /tmp/sf1 (testdata is read-only).

Purpose: sf1 spot-parity for the heaviest queries. The sf0.01 driver gate
and the 10x sweep (SPARK_GRAFT_VERIFY_SF=0.1) each caught a distinct
float-parity class; a further 10x is the cheapest way to surface the next
overflow/rounding class (decimal->double output conversion once sums pass
18 significant digits, int overflow in folds) before the driver does.

Construction: 10 copies of every fact table with every key column shifted
by copy * OFFSET(domain), where OFFSET is the smallest power of 10 above
the domain's max key — referential integrity is preserved within each copy
(joins behave like 10 disjoint sf0.1 shards, the same way TPC-H scales).
region/nation are fixed-size dimensions at every SF and are copied as-is.
Non-key columns (texts, timestamps, prices) are NOT perturbed: both engines
read identical bytes, so parity is exact by construction, and duplicated
texts make the dedup band strictly harder (10-deep exact-dup classes).

pyarrow round-trip preserves the physical schema — crucially events.ts
stays TIMESTAMP(NANOS), the round-1 session-conf hazard.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key domains: every column sharing a domain shifts by the same offset
DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
COPY_AS_IS = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    tables = {t: pq.read_table(SRC / f"{t}.parquet") for t in SCALED}

    offsets: dict[str, int] = {}
    for dom, cols in DOMAINS.items():
        mx = max(pc.max(tables[t][c]).as_py() for t, c in cols)
        off = 10
        while off <= mx:
            off *= 10
        offsets[dom] = off
    print("domain offsets:", offsets)

    shift_cols = {t: [] for t in SCALED}
    for dom, cols in DOMAINS.items():
        for t, c in cols:
            shift_cols[t].append((c, offsets[dom]))

    for t in COPY_AS_IS:
        tab = pq.read_table(SRC / f"{t}.parquet")
        pq.write_table(tab, DST / f"{t}.parquet", compression="snappy")
        print(f"{t}: {tab.num_rows} rows (as-is)")

    for t in SCALED:
        base = tables[t]
        copies = []
        for i in range(COPIES):
            tab = base
            for col, off in shift_cols[t]:
                idx = tab.schema.get_field_index(col)
                typ = tab.schema.field(idx).type
                shifted = pc.add(tab[col], pa.scalar(i * off, type=typ))
                tab = tab.set_column(idx, tab.schema.field(idx), shifted)
            copies.append(tab)
        out = pa.concat_tables(copies)
        pq.write_table(out, DST / f"{t}.parquet", compression="snappy")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
