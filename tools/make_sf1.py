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

Usage: make_sf1.py [outdir] [copies] [mode]   (default /tmp/graft-sf1, 10)
copies=100 builds the sf10 step (offsets stay collision-free to 100
copies: the largest shifted key is ~99 * base, well under the next
table's base). Idempotent via a _READY marker.

mode=textgrow de-degenerates the TEXT axis (VERDICT r17 item 1): the
verbatim-copy fixture's vocabulary, distinct bigrams, and LM tables
stop growing past sf0.1, so the t/c families' scale curves measured
only the dup-storm axis. In textgrow, copy i > 0 deterministically
suffixes every word of >= 5 chars with 'q<i>' (copy 0 stays verbatim):
short hub words ('a', 'the', 'line', 'scan', ...) remain SHARED across
all copies — hub skew persists and its absolute mass grows with sf,
which is what lmPerDoc's skew claim needs tested — while the tail
vocabulary, bigram space, and tf-idf vocabulary grow linearly with
copies, the shape a real growing crawl has. n_chars is recomputed to
match the perturbed text. Exact/near cross-copy dup structure is
deliberately destroyed (that axis belongs to the default copy mode);
within-copy dups survive.
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1")
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MODE = sys.argv[3] if len(sys.argv) > 3 else "copy"
assert MODE in ("copy", "textgrow"), MODE

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
    # The 100x (copies=1000) build's ORDER BY over ~600M lineitem rows
    # OOM-killed an unbounded DuckDB; bound it and spill to disk.
    con.execute("SET memory_limit='32GB'")
    con.execute("SET temp_directory='/tmp/graft-duck-spill'")
    # Past this many copies per COPY, chunk the output into a parquet
    # DIRECTORY of part files (one per copy range) — each chunk sorts
    # in memory, and Spark/DuckDB both read the directory (Spark
    # natively; DuckDB via '<dir>/*.parquet').
    chunk = 100
    for t, shifts in SHIFTS.items():
        schema = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()
        names = [row[0] for row in schema]
        def col_expr(n):
            if n in shifts:
                return f"({n} + i * {shifts[n]})::BIGINT AS {n}"
            if MODE == "textgrow" and t == "documents" and n == "text":
                # seeded, deterministic word remap: long words get a
                # per-copy suffix, short hub words stay shared
                return ("CASE WHEN i = 0 THEN text ELSE regexp_replace("
                        "text, '([a-z]{5,})', '\\1q' || CAST(i AS VARCHAR),"
                        " 'g') END AS text")
            if MODE == "textgrow" and t == "documents" and n == "n_chars":
                return ("length(CASE WHEN i = 0 THEN text ELSE "
                        "regexp_replace(text, '([a-z]{5,})', "
                        "'\\1q' || CAST(i AS VARCHAR), 'g') END)"
                        "::BIGINT AS n_chars")
            return n
        proj = ", ".join(col_expr(n) for n in names)

        def copy_range(lo, hi, dest):
            con.execute(f"""
                COPY (SELECT {proj}
                      FROM read_parquet('{SRC}/{t}.parquet')
                      CROSS JOIN (SELECT unnest(generate_series({lo}, {hi})) AS i)
                      ORDER BY i)
                TO '{dest}' (FORMAT PARQUET, COMPRESSION ZSTD)""")

        if COPIES <= chunk:
            copy_range(0, COPIES - 1, f"{OUT}/{t}.parquet")
            glob = f"{OUT}/{t}.parquet"
        else:
            part_dir = OUT / f"{t}.parquet"
            part_dir.mkdir(exist_ok=True)
            for lo in range(0, COPIES, chunk):
                hi = min(lo + chunk, COPIES) - 1
                copy_range(lo, hi, f"{part_dir}/part-{lo:05d}.parquet")
            glob = f"{OUT}/{t}.parquet/*.parquet"
        n = con.execute(f"SELECT count(*) FROM read_parquet('{glob}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)
    for t in PASSTHROUGH:
        con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                        TO '{OUT}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
        print(f"{t}: copied")
    marker.touch()
    print(f"sf1 fixture ready at {OUT}")


if __name__ == "__main__":
    main()
