#!/usr/bin/env python3
"""Regenerate the DuckDB proxy timings in BENCH_PROXY.md.

Usage: python3 tools/bench_proxy.py <sfDir> <verifyOutDir>
(needs <verifyOutDir>/oracle_sql.json from a graft.Verify run)
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
BENCH = ["q01_filter_scan", "q02_star_join", "q06_outer_join_agg",
         "q08_agg_pricing", "q16_session_window", "t01_token_stats",
         "t07_tfidf", "t13_bigram_lm", "t14_gopher_filter",
         "t16_lm_buckets",
         "d03_lsh_pairs",
         "s01_topk_cosine", "s08_topk_agg", "s17_mmr_rerank",
         "m02_frame_sample",
         "m06_frame_dedup", "c01_clean_corpus", "c02_decontaminate",
         "c03_train_pipeline", "c04_decontaminate_bloom",
         "p05_shard_shuffle", "j01_asof_join", "j03_asof_plan",
         "dwca04_convert_zipscan", "dwca08_convert_bulk"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # same methodology as graft.Bench: one untimed warmup, median of 3
    res = {}
    for q in BENCH:
        con.sql(oracle[q]).fetchall()
        times = []
        for _ in range(3):
            t0 = time.time()
            con.sql(oracle[q]).fetchall()
            times.append(time.time() - t0)
        res[q] = round(sorted(times)[1], 3)
    res["total"] = round(sum(res.values()), 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
