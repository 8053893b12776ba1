#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, run the matching oracle SQL in
DuckDB over the same testdata tables, then compare row count, schema
(column names), and a hash of the value matrix with columns sorted by
name and rows sorted.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def streaming_compare(con, out_dir, name, oracle_sql, results,
                      timeout_s, skip_reason):
    """Memory-bounded equality gate for huge results: DuckDB sorts both
    sides (ORDER BY ALL over the name-sorted projection, spilling to
    temp_directory), Python hashes norm()-ed rows in 64k batches. Rows,
    schema, and types are compared exactly as the in-memory path; the
    hash differs from frame_fingerprint's (string-sort vs native-sort
    order) but is computed identically for BOTH sides, so hash_match
    means the same thing."""
    import threading as _th
    dump = f"'{out_dir}/{name}/*.parquet'"
    probe_s = con.sql(f"SELECT * FROM {dump} LIMIT 0")
    cur = con.cursor()      # oracle side
    cur2 = con.cursor()     # dump side (its 240M-row sort is also cuttable)
    done = _th.Event()
    timed_out = [False]
    if timeout_s > 0:
        def _cut(targets=(cur, cur2)):
            if done.wait(timeout_s):
                return
            timed_out[0] = True
            print(f"[check] TIMEOUT {name} after {timeout_s}s — "
                  f"interrupting (streaming)", file=sys.stderr, flush=True)
            while not done.wait(5):
                for t in targets:
                    try:
                        t.interrupt()
                    except Exception:
                        pass
        _th.Thread(target=_cut, daemon=True).start()
    try:
        probe_o = cur.sql(f"SELECT * FROM ({oracle_sql}) LIMIT 0")
        s_cols, o_cols = list(probe_s.columns), list(probe_o.columns)
        schema_match = sorted(s_cols) == sorted(o_cols)
        widen = {"TINYINT": "BIGINT", "SMALLINT": "BIGINT",
                 "INTEGER": "BIGINT", "UINTEGER": "BIGINT",
                 "JSON": "VARCHAR"}
        def tsig(rel):
            ts = [str(t).upper() for t in rel.types]
            return sorted((c, widen.get(t, t)) for c, t in zip(rel.columns, ts))
        type_match = tsig(probe_s) == tsig(probe_o) if schema_match else False
        if not schema_match:
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "type_match": False,
                             "spark_cols": s_cols, "oracle_cols": o_cols}
            print(f"[result] {name} " + json.dumps(results[name]),
                  file=sys.stderr, flush=True)
            return
        proj = ", ".join(f'"{c}"' for c in sorted(s_cols))
        def stream_hash(c, sql_text):
            rel = c.sql(f"SELECT {proj} FROM ({sql_text}) ORDER BY ALL")
            h, n = hashlib.sha256(), 0
            while True:
                batch = rel.fetchmany(65536)
                if not batch:
                    break
                n += len(batch)
                for r in batch:
                    h.update(("\x1f".join(norm(v) for v in r) + "\x1e")
                             .encode())
            return h.hexdigest(), n
        s_hash, s_n = stream_hash(cur2, f"SELECT * FROM {dump}")
        o_hash, o_n = stream_hash(cur, oracle_sql)
        done.set()
        rows_match = s_n == o_n
        hash_match = rows_match and s_hash == o_hash
        results[name] = {"rows_match": rows_match,
                         "schema_match": schema_match,
                         "hash_match": hash_match, "type_match": type_match,
                         "n_spark": s_n, "n_oracle": o_n,
                         "compare_mode": "streaming"}
    except Exception as e:
        if timed_out[0]:
            results[name] = {"oracle_timeout_s": timeout_s,
                             "note": "oracle interrupted: " + skip_reason}
        else:
            results[name] = {"error": str(e)[:300]}
    finally:
        done.set()
        for c in (cur, cur2):
            try:
                c.close()
            except Exception:
                pass
    print(f"[result] {name} " + json.dumps(results[name]),
          file=sys.stderr, flush=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # Bound the oracle's memory and let it SPILL instead of riding the
    # OOM-killer: g06's label-prop oracle at sf1 materializes a
    # >100 GB intermediate if left unbounded (the engine side is fine
    # — this protects the CHECKER). Override via GRAFT_DUCK_MEM.
    mem = os.environ.get("GRAFT_DUCK_MEM", "48GB")
    # Per-PROCESS spill dir: DuckDB names its temp files
    # duckdb_temp_storage-<n>.tmp inside temp_directory, so two
    # concurrent checkers sharing one dir clobber each other's spill.
    tmp = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                       f"graft-duck-spill-{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    import atexit, shutil
    atexit.register(shutil.rmtree, tmp, True)
    con.sql(f"SET memory_limit='{mem}'")
    con.sql(f"SET temp_directory='{tmp}'")
    # Fewer threads = smaller per-thread agg/join buffers; the big-SF
    # sweeps trade a little wall time for staying inside the cap.
    con.sql(f"SET threads={os.environ.get('GRAFT_DUCK_THREADS', '16')}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # chunked big-SF builds (make_sf1.py COPIES > 100) emit a
            # parquet DIRECTORY of part files; DuckDB needs the glob
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results, n_ok = {}, 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # Big-SF sweep guards, both recorded IN the artifact (exclusions
    # must be named in the file, not prose — VERDICT r17 item 2):
    # GRAFT_CHECK_SKIP=q1,q2 marks named oracles as skipped with the
    # reason from GRAFT_CHECK_SKIP_REASON; GRAFT_CHECK_TIMEOUT=<sec>
    # interrupts any single oracle that runs past the limit (a g06-class
    # iterative oracle at sf10 would otherwise spill past the disk).
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    skip_reason = os.environ.get("GRAFT_CHECK_SKIP_REASON",
                                 "checker cost at this scale")
    timeout_s = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0"))
    for name in names:
        if only and name not in only:
            continue
        import time as _t
        import threading as _th
        print(f"[check] {name} ...", file=sys.stderr, flush=True)
        _t0 = _t.time()
        # Skip decisions come BEFORE the dump fetch: a skipped query's
        # dump may be exactly the thing that is too big to fetchall
        # (observed: checker OOM on a pair-list dump at sf10).
        if name in skip:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
                        ).fetchone()[0]
            results[name] = {"rows": n, "oracle_skipped": skip_reason}
            print(f"[result] {name} " + json.dumps(results[name]),
                  file=sys.stderr, flush=True)
            continue
        # STREAMING compare for huge results (q29's 240 M-row unpivot
        # crashed the in-memory fetchall+sort): both sides sorted by
        # DuckDB (`ORDER BY ALL`, spill-backed) and hashed in batches.
        # Equal multisets <=> equal sorted sequences (ORDER BY ALL ties
        # are fully-identical rows), so this is the same gate with
        # bounded checker memory. Threshold via GRAFT_CHECK_STREAM_ROWS
        # (0 = off, the default: gate-scale runs keep the exact
        # in-memory path whose hashes match the driver's).
        stream_rows = int(os.environ.get("GRAFT_CHECK_STREAM_ROWS", "0"))
        if stream_rows > 0 and name in oracle:
            n_dump = con.sql(f"SELECT count(*) FROM "
                             f"'{out_dir}/{name}/*.parquet'").fetchone()[0]
            if n_dump >= stream_rows:
                streaming_compare(con, out_dir, name, oracle[name],
                                  results, timeout_s, skip_reason)
                continue
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = [c for c in spark_rel.columns]
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            results[name] = {"rows": len(s_rows), "oracle": None}
            # same incremental line as every other branch: a killed
            # sweep must keep rows-only records too (salvage_merge
            # can't recover what was never printed)
            print(f"[result] {name} " + json.dumps(results[name]),
                  file=sys.stderr, flush=True)
            continue
        timed_out = [False]
        done = _th.Event()
        # Each oracle runs on its OWN cursor (an independent DuckDB
        # connection to the shared catalog): the cutter interrupts the
        # cursor, never `con`, so a late interrupt — one that fires in
        # the fetchall→done window after the oracle actually finished —
        # can at worst no-op on a dead cursor; it can never poison the
        # NEXT oracle (the race the is_set() re-check shrank but could
        # not close). Views and SET memory/temp/threads are database-
        # level, so cursors inherit them.
        cur = con.cursor()
        if timeout_s > 0:
            # Re-fire the interrupt until the query actually dies: a
            # single interrupt() can be missed by a pipeline that is
            # between poll points (observed: 45+ min past the timer on
            # one oracle), so the cutter loops.
            def _cut(target=cur):
                if done.wait(timeout_s):
                    return
                timed_out[0] = True
                print(f"[check] TIMEOUT {name} after {timeout_s}s — "
                      f"interrupting", file=sys.stderr, flush=True)
                while not done.wait(5):
                    try:
                        target.interrupt()
                    except Exception:
                        return  # cursor already closed — nothing to cut
            cutter = _th.Thread(target=_cut, daemon=True)
            cutter.start()
        try:
            o_rel = cur.sql(oracle[name])
            o_cols = [c for c in o_rel.columns]
            o_rows = o_rel.fetchall()
            done.set()
        except Exception as e:
            if timed_out[0]:
                results[name] = {"oracle_timeout_s": timeout_s,
                                 "note": "oracle interrupted: " + skip_reason}
            else:
                results[name] = {"error": str(e)[:300]}
            print(f"[result] {name} " + json.dumps(results[name]),
                  file=sys.stderr, flush=True)
            try:
                cur.close()
            except Exception:
                pass
            continue
        finally:
            done.set()
        rows_match = len(s_rows) == len(o_rows)
        schema_match = sorted(s_cols) == sorted(o_cols)
        hash_match = (frame_fingerprint(s_cols, s_rows)
                      == frame_fingerprint(o_cols, o_rows)) if schema_match else False
        # Type check: the driver's gate is type-aware (r02: t01 failed on
        # HUGEINT-vs-BIGINT while str()-normalized values matched). Compare
        # column types sorted by name, modulo widenings that normalize to
        # the same Python value (INT* -> BIGINT; DECIMAL kept distinct).
        widen = {"TINYINT": "BIGINT", "SMALLINT": "BIGINT",
                 "INTEGER": "BIGINT", "UINTEGER": "BIGINT",
                 # DuckDB's to_json returns JSON; Spark's is a string.
                 # The driver gate accepted this in r02 (q19 green).
                 "JSON": "VARCHAR"}
        def tsig(rel):
            ts = [str(t).upper() for t in rel.types]
            return sorted((c, widen.get(t, t)) for c, t in zip(rel.columns, ts))
        type_match = tsig(spark_rel) == tsig(o_rel) if schema_match else False
        ok = rows_match and schema_match and hash_match and type_match
        n_ok += ok
        # Incremental result line (stderr): a killed/crashed run keeps
        # every completed comparison — a 60-query sweep's results must
        # never die with the process (learned from a disk-full kill).
        print(f"[result] {name} " + json.dumps(
            {"rows_match": rows_match, "schema_match": schema_match,
             "hash_match": hash_match, "type_match": type_match,
             "n_spark": len(s_rows), "n_oracle": len(o_rows)}),
            file=sys.stderr, flush=True)
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "type_match": type_match,
                         "n_spark": len(s_rows), "n_oracle": len(o_rows)}
        if not ok:
            results[name]["spark_cols"] = s_cols
            results[name]["oracle_cols"] = o_cols
            results[name]["spark_types"] = [str(t) for t in spark_rel.types]
            results[name]["oracle_types"] = [str(t) for t in o_rel.types]
            if rows_match and schema_match:
                # show first differing row for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                ms = sorted(tuple(norm(r[i]) for i in order_s) for r in s_rows)
                mo = sorted(tuple(norm(r[i]) for i in order_o) for r in o_rows)
                for a, b in zip(ms, mo):
                    if a != b:
                        results[name]["first_diff"] = {"spark": a, "oracle": b}
                        break
        try:
            cur.close()
        except Exception:
            pass
    print(json.dumps(results, indent=1))
    n_oracle = sum(1 for r in results.values() if "rows_match" in r or "error" in r)
    print(f"== {n_ok}/{n_oracle} oracle-checked green; "
          f"{len(results) - n_oracle} rows-only ==", file=sys.stderr)
    # Persist scale-sweep evidence as an artifact (VERDICT r16 item 6):
    # a FULL run (no subset filter) at a non-gate scale writes
    # CORRECTNESS_sf<N>.json next to this script's repo root, in the
    # gate file's shape, so scale correctness survives sessions the
    # way gate correctness does. GRAFT_CHECK_TAG overrides the tag
    # (e.g. "sf1_prefix" for a named subset sweep — subset runs only
    # write when the tag is explicit, so a one-query debug run can
    # never masquerade as a sweep).
    # Auto-tagging is restricted to the KNOWN sweep dirs with all
    # tables present — a full run on sf0.001, or on a dir with missing
    # parquets (whose views were silently skipped above), must not
    # mint an artifact that looks like scale evidence. Anything else
    # needs an explicit GRAFT_CHECK_TAG.
    tag = os.environ.get("GRAFT_CHECK_TAG")
    if tag is None and not only:
        import re
        base = os.path.basename(os.path.normpath(sf_dir))
        m = re.fullmatch(r"(?:graft-)?(sf(?:1|10|100)(?:-[a-z0-9]+)*)", base)
        if m:
            missing = [t for t in TABLES
                       if not os.path.exists(f"{sf_dir}/{t}.parquet")]
            if missing:
                sys.exit(f"refusing to write CORRECTNESS artifact: "
                         f"{base} is missing tables {missing}")
            tag = m.group(1).replace("-", "_")
    if tag:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, f"CORRECTNESS_{tag}.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"== wrote {path} ==", file=sys.stderr)


if __name__ == "__main__":
    main()
