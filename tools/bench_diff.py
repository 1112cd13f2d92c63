#!/usr/bin/env python3
"""Bench-drift triage (round-14 verdict #6): diff a fresh
bench_result.json against the previously COMMITTED one and flag
per-query drift, so a drifting query is a build artifact, not a judge
discovery.

Context the report carries: rounds 12-14 established the ambient band
of this box at +/-8% for identical code (two same-code sessions
measured 97.0 vs 106.0 s), so a per-query ratio inside [1/1.15, 1.5]
on a sub-second row is noise; the report flags ratios above 1.5x (or
below 1/1.5) AND an absolute move above 0.25 s, prints them worst
first, and writes bench_diff.json next to bench_result.json.

Usage:
  python3 tools/bench_diff.py                 # new = ./bench_result.json,
                                              # old = git show HEAD:bench_result.json
  python3 tools/bench_diff.py OLD.json NEW.json
"""
import json
import subprocess
import sys

RATIO = 1.5
ABS_SEC = 0.25
AMBIENT = "ambient band +/-8% for identical code (r12-r14 forensics)"

if len(sys.argv) == 3:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    old_src, new_src = sys.argv[1], sys.argv[2]
else:
    new = json.load(open("bench_result.json"))
    new_src = "bench_result.json"
    old_src = "git show HEAD:bench_result.json"
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:bench_result.json"],
            capture_output=True, text=True, check=True).stdout
        old = json.loads(blob)
    except (subprocess.CalledProcessError, json.JSONDecodeError) as e:
        sys.exit(f"no committed bench_result.json to diff against: {e}")

oq, nq = old.get("queries", {}), new.get("queries", {})
shared = sorted(set(oq) & set(nq))
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))

rows = []
for q in shared:
    a, b = oq[q], nq[q]
    # severity: symmetric drift magnitude; a zero on either side is
    # maximally alarming (a query vanished or appeared from nothing)
    ratio = b / a if a > 0 else float("inf")
    sev = max(ratio, 1 / ratio) if 0 < ratio < float("inf") else float("inf")
    if sev > RATIO and abs(b - a) > ABS_SEC:
        rows.append({"query": q, "old_sec": round(a, 3),
                     "new_sec": round(b, 3),
                     # finite in strict JSON: a zero/inf ratio reports null
                     "ratio": round(ratio, 2) if 0 < ratio < float("inf") else None,
                     "_sev": sev})
rows.sort(key=lambda r: -r["_sev"])
for r in rows:
    del r["_sev"]

shared_old = sum(oq[q] for q in shared)
shared_new = sum(nq[q] for q in shared)
report = {
    "metric": "bench_diff",
    "old": old_src, "new": new_src,
    "old_total_sec": round(old.get("value", 0.0), 2),
    "new_total_sec": round(new.get("value", 0.0), 2),
    "shared_queries": len(shared),
    "shared_total_ratio": round(shared_new / shared_old, 3) if shared_old else None,
    "flag_threshold": {"ratio": RATIO, "abs_sec": ABS_SEC},
    "ambient_context": AMBIENT,
    "flagged": rows,
    "added_queries": added,
    "removed_queries": removed,
}
with open("bench_diff.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report, indent=1))
if rows:
    print(f"\n{len(rows)} queries drifted past {RATIO}x and {ABS_SEC}s "
          f"({AMBIENT}) — triage before committing the bench", file=sys.stderr)
