#!/usr/bin/env python3
"""Fold a completed bench run's per-query times into BENCH_FLOOR.json
(per-query MIN over all known complete runs, scale-tagged — the round-13
floor protocol: fold-in-min, never overwrite).

Usage: python3 tools/fold_floor.py <bench_artifact.json> [floor.json]

The artifact is a Bench compact/BENCH_LOCAL line (one JSON object with a
"queries" map and an "sf" dir). Refuses to fold a run whose sf basename
differs from the floor's, a partial run, or a run with failures in its
map (-1 entries are skipped per-query, not fatal).
"""
import json
import os
import sys

art_path = sys.argv[1]
floor_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FLOOR.json"

with open(art_path) as f:
    art = json.loads(f.read().strip().splitlines()[-1])
sf = os.path.basename(art["sf"].rstrip("/"))
if art.get("passes_done", 0) < 1:
    sys.exit(f"refusing: artifact has no completed measured pass")
if art.get("partial", False):
    sys.exit("refusing: artifact is tagged partial=true — the floor "
             "protocol folds certified COMPLETE runs only")

floor = {"sf": sf, "queries": {}}
if os.path.exists(floor_path):
    with open(floor_path) as f:
        floor = json.load(f)
if floor.get("sf") != sf:
    sys.exit(f"refusing: floor sf={floor.get('sf')} != run sf={sf}")

lowered = kept = added = 0
for q, t in art["queries"].items():
    if t is None or t < 0:
        continue
    old = floor["queries"].get(q)
    if old is None:
        floor["queries"][q] = t
        added += 1
    elif t < old:
        floor["queries"][q] = t
        lowered += 1
    else:
        kept += 1

with open(floor_path, "w") as f:
    json.dump(floor, f, indent=0, sort_keys=True)
    f.write("\n")
print(f"folded {art_path} into {floor_path}: "
      f"{lowered} lowered, {added} added, {kept} kept")
