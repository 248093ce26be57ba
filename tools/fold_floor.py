#!/usr/bin/env python3
"""Fold a completed bench run's per-query times into the floor file
(per-query MIN over all known complete runs, scale-tagged — the round-13
floor protocol: fold-in-min, never overwrite).

Usage: python3 tools/fold_floor.py [--sf1] <bench_artifact.json> [floor.json]

The artifact is a Bench compact/BENCH_LOCAL line (one JSON object with a
"queries" map and an "sf" dir). Refuses to fold a run whose sf basename
differs from the floor's, a run with no completed measured pass, or a run
tagged partial. Per-query -1/None entries (a failed or skipped query) are
SKIPPED, not fatal: the rest of a complete run still carries floor
evidence. A floor file with an unexpected shape is refused with the
reason, never a stack trace.

--sf1 selects the sf1 floor (SF1_FLOOR.json) as the default floor path —
the scale-regression twin of BENCH_FLOOR.json (round-15 protocol: sf1
runs fold there so a >1.5x-vs-floor scale regression is as detectable as
an sf0.1 one).
"""
import json
import os
import sys

args = [a for a in sys.argv[1:] if a != "--sf1"]
sf1_mode = "--sf1" in sys.argv[1:]
if not args:
    sys.exit(__doc__)
art_path = args[0]
floor_path = args[1] if len(args) > 1 else (
    "SF1_FLOOR.json" if sf1_mode else "BENCH_FLOOR.json")

with open(art_path) as f:
    art = json.loads(f.read().strip().splitlines()[-1])
if not isinstance(art.get("queries"), dict) or not art["queries"]:
    sys.exit(f"refusing: artifact {art_path} has no queries map")
sf = os.path.basename(art["sf"].rstrip("/"))
if art.get("passes_done", 0) < 1:
    sys.exit("refusing: artifact has no completed measured pass")
if art.get("partial", False):
    sys.exit("refusing: artifact is tagged partial=true — the floor "
             "protocol folds certified COMPLETE runs only")

floor = {"sf": sf, "queries": {}}
if os.path.exists(floor_path):
    with open(floor_path) as f:
        try:
            floor = json.load(f)
        except ValueError as e:
            sys.exit(f"refusing: floor {floor_path} is not valid JSON "
                     f"({e}) — fix or remove it; folding into a corrupt "
                     "floor would silently drop its history")
    if not isinstance(floor, dict):
        sys.exit(f"refusing: floor {floor_path} is not a JSON object")
    if not isinstance(floor.setdefault("queries", {}), dict):
        sys.exit(f"refusing: floor {floor_path} has a non-object "
                 "'queries' — fix the floor file by hand")
if floor.get("sf") != sf:
    sys.exit(f"refusing: floor sf={floor.get('sf')} != run sf={sf}")

lowered = kept = added = 0
for q, t in art["queries"].items():
    if t is None or not isinstance(t, (int, float)) or t < 0:
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
