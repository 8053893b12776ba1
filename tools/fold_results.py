#!/usr/bin/env python3
"""Fold per-query recheck records into a CORRECTNESS artifact.

Usage: fold_results.py <artifact.json> <result.json> [...]
Each result file is a {name: record} map as emitted by check.py;
records replace the artifact's entry for that name. Keeps key order
sorted for stable diffs.
"""
import json
import sys

art_path = sys.argv[1]
art = json.load(open(art_path))
for p in sys.argv[2:]:
    for name, rec in json.load(open(p)).items():
        old = art.get(name)
        art[name] = rec
        print(f"{name}: {json.dumps(old)[:80]} -> {json.dumps(rec)[:80]}")
json.dump(dict(sorted(art.items())), open(art_path, "w"), indent=1)
print(f"wrote {art_path} ({len(art)} entries)")
