#!/usr/bin/env python3
"""Dev-only: render SCALE.md's measurement table from scale.json, so the
committed prose can never drift from the committed artifact (r15: the table
gained shuffle/spill and per-stage columns — hand-transcribing 50 rows per
round was the drift risk). Usage: python3 scripts/scale_md_table.py"""
import json

rows = json.load(open("scale.json"))
FLAGS = ["rows_track_xN", "cand_track_model", "runtime_within_bound",
         "spill_within_bound", "extra_within_bound"]

print("| operator | factor | found rows | candidate pairs | sec | ctl ratio |"
      " gc s | shuffle MB | spill MB | stage split | model |")
print("|---|---|---|---|---|---|---|---|---|---|---|")
for d in rows:
    stage = "; ".join(f"{k[:-3]} {v / 1000:.1f}s"
                      for k, v in d.items() if k.endswith("_ms")) or "—"
    extras = []
    if "cc_rounds" in d:
        extras.append(f"rounds={d['cc_rounds']}")
    if "cand_per_1k_incoming" in d:
        extras.append(f"{d['cand_per_1k_incoming']:,}/1k in")
    if "blocks_opened" in d:
        extras.append(f"{d['blocks_opened']} opened of "
                      f"{d['index_blocks']} idx blocks")
    if "docs_in" in d:
        extras.append(f"docs_in={d['docs_in']:,}")
    if "corpus_x_bands" in d:
        extras.append(f"corpus×bands={d['corpus_x_bands']:,}")
    if "state_rows_peak" in d:
        extras.append(f"state peak={d['state_rows_peak']:,}"
                      f" final={d.get('state_rows', -1):,}"
                      f" batches={d.get('batches', -1)}")
    elif "state_rows" in d:
        extras.append(f"state={d['state_rows']:,} rows,"
                      f" {d.get('batches', -1)} batches")
    model = d["model"] + (f" ({', '.join(extras)})" if extras else "")
    bad = [f for f in FLAGS if not d.get(f, True)]
    if bad:
        model += " **FLAGS: " + ",".join(bad) + "**"
    # sec is the median repeat; the spread and the control live in the
    # artifact (sec_runs / control_runs / control_sec)
    cr = d.get("control_ratio", -1)
    ctl = f"{cr:.1f}" if cr > 0 else "—"
    print(f"| {d['op']} | ×{d['factor']} | {d['rows']:,} |"
          f" {d['candidates']:,} | {d['sec']:.2f} | {ctl} | {d['gc_sec']:.2f} |"
          f" {d['shuffle_bytes'] / 1e6:,.0f} | {d['spill_bytes'] / 1e6:,.0f} |"
          f" {stage} | {model} |")

n_ok = sum(all(d.get(f, True) for f in FLAGS) for d in rows)
print(f"\n{n_ok}/{len(rows)} rows with all flags true.")

# the audit summary the prose quotes — printed from the artifact so the
# committed counts can never drift from plan_audit.json (r15 ADVICE)
try:
    audit = json.load(open("plan_audit.json"))

    def at_factor(key, label, list_queries=False):
        # construction/eager/streaming arrays share one shape (r17):
        # [{query, factor, flags:[...]}, ...]
        rows = audit.get(key, [])
        if not rows:
            return ""
        nflags = sum(len(c["flags"]) for c in rows)
        detail = (": " + ", ".join(
            f"{c['query']}@x{c['factor']}" for c in rows)
            if list_queries else "")
        return f", {len(rows)} {label} ({nflags} flags{detail})"

    print(f"audit: {audit['audited']} audited, "
          f"{len(audit['flagged'])} flagged"
          f"{at_factor('construction_audited', 'construction-audited', True)}"
          f"{at_factor('eager_audited', 'eager-audited')}"
          f"{at_factor('streaming_audited', 'streaming-audited')}, "
          f"{len(audit['skipped'])} skipped (at {audit['dir']})")
except (FileNotFoundError, KeyError, ValueError) as e:
    # a pre-r16 or truncated artifact must not kill the table render
    print(f"audit: plan_audit.json missing/stale/unreadable ({e!r})")
