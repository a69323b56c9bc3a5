#!/usr/bin/env python3
"""Rewrite BENCH_ISOLATED.md's per-query table from a fresh sf0.1
graft.Bench record, preserving everything before the table header and
after the table (e.g. the sf1 scale-probe section).

Usage: python3 tools/update_bench_isolated.py <bench_record.json>
"""
import json
import sys

record = json.load(open(sys.argv[1]))
assert record.get("errors") in ({}, None), f"bench had errors: {record['errors']}"
med = record["queries"]
mins = record["queries_min"]

path = "BENCH_ISOLATED.md"
lines = open(path).read().split("\n")
# table spans from the header row to the last "| ... |" line before a
# non-table line; keep prose before and any sections after
hdr = next(i for i, l in enumerate(lines) if l.startswith("| query"))
end = hdr
while end + 1 < len(lines) and lines[end + 1].startswith("|"):
    end += 1
table = ["| query | median (s) | min (s) |", "|---|---|---|"] + [
    f"| {k} | {med[k]:.3f} | {mins[k]:.3f} |" for k in sorted(med)
]
lines[hdr:end + 1] = table
open(path, "w").write("\n".join(lines))
total = sum(med.values())
total_min = sum(mins.values())
print(f"wrote {path}: {len(med)} queries, total {total:.1f} s, "
      f"total-min {total_min:.1f} s")
