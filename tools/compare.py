#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result, run
the matching oracle SQL (from oracle_sql.json) in DuckDB over views named
after the testdata tables, then compare after sorting columns by name and
rows by all columns. Prints PASS/FAIL per query.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def tuplize(v):
    # lists/arrays -> tuples, recursively, so cells sort/hash/compare
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(tuplize(x) for x in v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(tuplize)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_clash(g: pd.Series, w: pd.Series):
    """Int-vs-float dtype asymmetry with no nulls to excuse it.

    DuckDB types sum()/'//' results HUGEINT and pandas materializes
    HUGEINT as float64, so an uncast oracle column shows 149.0 where
    Spark writes int64 149. Numeric == hides that; the driver's hasher
    does not (r9/r10 q_token_pps + text_bpe_fertility). A float column
    WITH NaNs may just be pandas' null-upcast of a nullable int, so only
    the no-null case is a hard clash.
    """
    kinds = {g.dtype.kind, w.dtype.kind}
    if kinds & {"i", "u"} and "f" in kinds:
        f = g if g.dtype.kind == "f" else w
        if not f.isna().any():
            return f"spark={g.dtype} duckdb={w.dtype}"
    return None


def eq(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    return a == b


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            clash = None
            for c in got.columns:
                msg = dtype_clash(got[c], want[c])
                if msg:
                    clash = (c, msg)
                    break
            if clash:
                c, msg = clash
                print(f"FAIL {name}: col {c} dtype clash: {msg}")
                n_fail += 1
                continue
            bad = None
            for c in got.columns:
                gv, wv = got[c].tolist(), want[c].tolist()
                for i, (g, w) in enumerate(zip(gv, wv)):
                    if not eq(g, w):
                        bad = (c, i, g, w)
                        break
                if bad:
                    break
            if bad:
                c, i, g, w = bad
                print(f"FAIL {name}: col {c} row {i}: spark={g!r} duckdb={w!r}")
                print(f"  dtypes: spark={got[c].dtype} duckdb={want[c].dtype}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
