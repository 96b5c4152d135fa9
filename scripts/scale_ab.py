#!/usr/bin/env python3
"""Dev-only: diff two scale.json sweeps (OLD NEW). The split that matters:
rows/candidates/extras are DETERMINISTIC (any delta = a code or fixture
change, never noise), while sec/shuffle/spill swing with the host (dd6 x64
measured 32-88 s across identical-code sweeps — disk-bound, gc flat). So
count deltas are reported loudly row-by-row, runtime only when a row leaves
the sweep-wide median band by 2x. Usage:
  git show <rev>:scale.json > /tmp/old.json
  python3 scripts/scale_ab.py /tmp/old.json scale.json"""
import json, sys
from statistics import median

old = {(r["op"], r["factor"]): r for r in json.load(open(sys.argv[1]))}
new = {(r["op"], r["factor"]): r for r in json.load(open(sys.argv[2]))}

for k in sorted(set(old) - set(new)):
    print(f"ROW GONE   {k[0]} x{k[1]}")
for k in sorted(set(new) - set(old)):
    print(f"ROW NEW    {k[0]} x{k[1]}")

shared = sorted(set(old) & set(new))
DET = ["rows", "candidates", "cc_rounds", "cand_per_1k_incoming",
       "blocks_opened", "index_blocks", "corpus_vectors", "found_rows"]
count_deltas = 0
for k in shared:
    o, n = old[k], new[k]
    for f in DET:
        if f in o or f in n:
            if o.get(f) != n.get(f):
                print(f"COUNT DELTA {k[0]} x{k[1]} {f}: {o.get(f)} -> {n.get(f)}"
                      "  (deterministic - a code/fixture change, NOT noise)")
                count_deltas += 1
    for f in ("rows_track_xN", "cand_track_model", "runtime_within_bound",
              "spill_within_bound", "extra_within_bound"):
        if o.get(f, True) and not n.get(f, True):
            print(f"FLAG WENT FALSE {k[0]} x{k[1]} {f}")
            count_deltas += 1

ratios = [new[k]["sec"] / old[k]["sec"] for k in shared if old[k]["sec"] > 0]
host = median(ratios) if ratios else 1.0
print(f"\nruntime: host factor {host:.3f} (median of {len(ratios)} row ratios)")
for k in shared:
    o, n = old[k], new[k]
    if o["sec"] <= 0:
        continue
    norm = (n["sec"] / o["sec"]) / host
    if norm > 2.0 or norm < 0.5:
        sp = f"  spill {o['spill_bytes']/1e6:,.0f} -> {n['spill_bytes']/1e6:,.0f} MB"
        print(f"  {k[0]:22s} x{k[1]:<3d} {o['sec']:7.2f} -> {n['sec']:7.2f} s"
              f"  norm {norm:.2f}{sp}")
print("(runtime rows above are OUTSIDE the 2x band after host normalization;"
      " everything else is within the documented disk-variance envelope)")

# r17: control-normalized comparison — the per-row shuffle control cancels
# host disk state, so a control_ratio moving >1.5x IS plan signal even on
# the disk-bound rows where wall-clock swings 3x on identical code.
ctl = [k for k in shared
       if old[k].get("control_ratio", -1) > 0
       and new[k].get("control_ratio", -1) > 0]
if ctl:
    print(f"\ncontrol-normalized ({len(ctl)} rows with control_ratio):")
    flagged = 0
    for k in ctl:
        rr = new[k]["control_ratio"] / old[k]["control_ratio"]
        if rr > 1.5 or rr < 1 / 1.5:
            print(f"  RATIO MOVED {k[0]:22s} x{k[1]:<3d} "
                  f"{old[k]['control_ratio']:.2f} -> "
                  f"{new[k]['control_ratio']:.2f}  (x{rr:.2f})")
            flagged += 1
    if not flagged:
        print("  all control ratios within 1.5x of the old sweep")
sys.exit(1 if count_deltas else 0)
