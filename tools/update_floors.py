#!/usr/bin/env python3
"""Rewrite src/test/resources/bench_floors_sf0.001.json from a fresh
graft.Bench record (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001
SPARK_GRAFT_BENCH_OUT=<record> sbt -batch "runMain graft.Bench").

Usage: python3 tools/update_floors.py <bench_record.json> "<note suffix>"
"""
import json
import sys

record = json.load(open(sys.argv[1]))
suffix = sys.argv[2] if len(sys.argv) > 2 else ""
assert record.get("errors") in ({}, None), f"bench had errors: {record['errors']}"
mins = record["queries_min"]
note = (
    "min-of-3-interleaved-rounds per-query seconds from graft.Bench at "
    "sf0.001, local[32], 32g heap (the min is the co-tenant-robust "
    "statistic; medians on this shared box carry 10-60x ambient windows). "
    "Regenerate with: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 "
    "SPARK_GRAFT_BENCH_OUT=/tmp/f.json sbt -batch \"runMain graft.Bench\", "
    "then run tools/update_floors.py. BenchGuardSpec's 8x slack + 10s "
    "absolute ceiling + one re-measure absorb the remaining swing. " + suffix
)
out = {"note": note, "queries": {k: mins[k] for k in sorted(mins)}}
path = "src/test/resources/bench_floors_sf0.001.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"wrote {path}: {len(mins)} queries")
