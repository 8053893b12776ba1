#!/usr/bin/env python3
"""Merge per-shard check.py result JSONs into one CORRECTNESS artifact.

A sharded big-SF sweep runs graft.Verify in N JVMs (disjoint query
subsets, separate outDirs — each shard's oracle_sql.json embeds THAT
JVM's RunScratch root, which is why the shards cannot share a dump
dir), then tools/check.py once per shard with GRAFT_CHECK_TAG= (empty,
no auto-write). This merges the captured stdout JSONs, refuses
overlapping query ids, and writes the standard artifact shape.

Usage: merge_check.py <out.json> <shard1.json> [shard2.json ...]
"""
import json
import sys

out, shards = sys.argv[1], sys.argv[2:]
merged = {}
for path in shards:
    part = json.load(open(path))
    dup = merged.keys() & part.keys()
    assert not dup, f"query ids in more than one shard: {sorted(dup)}"
    merged.update(part)
ok = sum(1 for r in merged.values()
         if r.get("rows_match") and r.get("schema_match")
         and r.get("hash_match") and r.get("type_match"))
checked = sum(1 for r in merged.values() if "rows_match" in r or "error" in r)
with open(out, "w") as f:
    json.dump(dict(sorted(merged.items())), f, indent=1)
print(f"== merged {len(shards)} shards -> {out}: {ok}/{checked} "
      f"oracle-checked green; {len(merged) - checked} rows-only/skipped ==",
      file=sys.stderr)
