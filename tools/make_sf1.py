#!/usr/bin/env python3
"""Scale-step fixture: build an sf1-shaped dataset (10x sf0.1) for the
one-off step-up bench (BENCH_PROXY.md "sf1 step-up" section).

Each fact table is 10 shifted copies of sf0.1 with consistent key
offsets, so referential integrity (orders.o_custkey -> customer,
lineitem.l_orderkey -> orders, l_partkey -> part, l_suppkey ->
supplier) holds within every copy. Dimension tables (region, nation)
keep their real-world cardinality and are NOT replicated — exactly how
a 10x bigger warehouse looks. Timestamps are left untouched (10x
events per window = the realistic densification). doc/vec/event/user
ids shift per copy; document text and embeddings repeat, so the dedup
tier sees 10-way exact-dup groups — more work, not less.

Usage: make_sf1.py [outdir] [copies]   (default /tmp/graft-sf1, 10)
copies=100 builds the sf10 step (offsets stay collision-free to 100
copies: the largest shifted key is ~99 * base, well under the next
table's base). Idempotent via a _READY marker.
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1")
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# table -> {column: offset-base}; offset for copy i is i * base.
# Bases are far above each table's max key so copies never collide.
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
PASSTHROUGH = ["region", "nation"]


def main():
    marker = OUT / "_READY"
    if marker.exists():
        print(f"{OUT} already built")
        return
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t, shifts in SHIFTS.items():
        schema = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()
        names = [row[0] for row in schema]
        proj = ", ".join(
            f"({n} + i * {shifts[n]})::BIGINT AS {n}" if n in shifts else n
            for n in names)
        con.execute(f"""
            COPY (SELECT {proj}
                  FROM read_parquet('{SRC}/{t}.parquet')
                  CROSS JOIN (SELECT unnest(generate_series(0, {COPIES - 1})) AS i)
                  ORDER BY i)
            TO '{OUT}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in PASSTHROUGH:
        con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                        TO '{OUT}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
        print(f"{t}: copied")
    marker.touch()
    print(f"sf1 fixture ready at {OUT}")


if __name__ == "__main__":
    main()
