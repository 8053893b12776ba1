#!/usr/bin/env python3
"""Fold sharded check.py evidence into one CORRECTNESS artifact.

Sources, in order of authority per query id:
  1. stdout JSONs from completed check.py runs (full result dicts)
  2. `[result] <name> {...}` stderr lines from killed/partial runs
Later sources never override an earlier full comparison; duplicate
ids across sources keep the first rows_match-bearing entry.

Usage: salvage_merge.py <out.json> <src.json|src.err> ...
"""
import json
import os
import re
import sys

out, srcs = sys.argv[1], sys.argv[2:]
merged = {}


def better(new, old):
    if old is None:
        return True
    # a full comparison beats a timeout/skip record
    return "rows_match" in new and "rows_match" not in old


for path in srcs:
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        continue
    text = open(path).read()
    if path.endswith(".json"):
        try:
            part = json.loads(text)
        except json.JSONDecodeError:
            continue
        for k, v in part.items():
            if better(v, merged.get(k)):
                merged[k] = v
    else:
        for m in re.finditer(r"^\[result\] (\S+) (\{.*\})$", text, re.M):
            v = json.loads(m.group(2))
            if better(v, merged.get(m.group(1))):
                merged[m.group(1)] = v
ok = sum(1 for r in merged.values()
         if r.get("rows_match") and r.get("schema_match")
         and r.get("hash_match") and r.get("type_match"))
full = sum(1 for r in merged.values() if "rows_match" in r)
to = sum(1 for r in merged.values() if "oracle_timeout_s" in r)
sk = sum(1 for r in merged.values() if "oracle_skipped" in r)
er = sum(1 for r in merged.values() if "error" in r)
with open(out, "w") as f:
    json.dump(dict(sorted(merged.items())), f, indent=1)
print(f"== {out}: {len(merged)} entries — {ok}/{full} oracle-green, "
      f"{to} timeouts, {sk} skips, {er} errors ==", file=sys.stderr)
