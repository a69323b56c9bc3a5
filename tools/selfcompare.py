#!/usr/bin/env python3
"""Determinism audit: compare TWO graft.Verify dump dirs frame-for-frame.

Usage: python3 tools/selfcompare.py <outDirA> <outDirB>

Both dirs must come from back-to-back `runMain graft.Verify` runs over the
same sfDir. Every query result is canonicalized exactly like the driver's
oracle compare (columns sorted by name, rows sorted by all columns,
arrays tuplized) and compared cell-for-cell. Any SELF-DIFF is a
nondeterministic query — the thing that must never ship to the driver.
"""
import json
import math
import sys

import pandas as pd

from compare import canon, eq  # same canonicalization as the oracle gate


def main(dir_a: str, dir_b: str) -> None:
    names = sorted(json.load(open(f"{dir_a}/oracle_sql.json")))
    names_b = sorted(json.load(open(f"{dir_b}/oracle_sql.json")))
    if names != names_b:
        print(f"FAIL query sets differ: {set(names) ^ set(names_b)}")
        sys.exit(1)
    n_pass = n_fail = 0
    for name in names:
        a = canon(pd.read_parquet(f"{dir_a}/{name}"))
        b = canon(pd.read_parquet(f"{dir_b}/{name}"))
        if list(a.columns) != list(b.columns):
            print(f"SELF-DIFF {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"SELF-DIFF {name}: {len(a)} vs {len(b)} rows")
            n_fail += 1
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i in range(len(av)):
                if not eq(av[i], bv[i]):
                    bad = (c, i, av[i], bv[i])
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"SELF-DIFF {name}: col {c} row {i}: {x!r} vs {y!r}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"{n_pass} deterministic, {n_fail} self-diff")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
