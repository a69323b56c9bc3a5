#!/usr/bin/env python3
"""Oracle dtype canary — the oracle-side sibling of SchemaCanarySpec.

Usage: python3 tools/oracle_dtypes.py <sfDir> <verifyOutDir>

For every registered oracle (oracle_sql.json in the Verify out dir), run
it under DuckDB with LIMIT 0 and assert:

  1. NO output column types to HUGEINT/UHUGEINT. DuckDB's sum() and //
     return HUGEINT; pandas materializes HUGEINT as float64, so the
     driver's hash sees 149.0 vs Spark's int64 149 while row/schema
     checks coerce — exactly the r9/r10 q_token_pps / text_bpe_fertility
     red rows. Every aggregate-derived column in a final select list
     must be CAST to BIGINT.
  2. Each top-level scalar column's DuckDB type maps to the Spark
     parquet column's arrow dtype (int64 <-> BIGINT, float64 <-> DOUBLE,
     ...). Nested/list/binary columns are kind-checked only.

This would have caught both red rows at authoring time. Run it with
tools/compare.py as part of the verify gate.
"""
import json
import os
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# arrow dtype prefix -> acceptable DuckDB type names (scalar columns).
# The driver's hash coerces INT WIDTHS (io_csv_roundtrip int64<->INTEGER
# is green) and DATE<->TIMESTAMP (q_scalar_date is green) — what it does
# NOT coerce is int-vs-float materialization, so any int width is fine
# but HUGEINT (pandas float64) never is.
INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
ARROW_TO_DUCK = {
    "int64": INTS,
    "int32": INTS,
    "int16": INTS,
    "int8": INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "large_string": {"VARCHAR"},
    "bool": {"BOOLEAN"},
    "binary": {"BLOB"},
    "large_binary": {"BLOB"},
    "date32": {"DATE", "TIMESTAMP"},
}

INT_KINDS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}
FLOAT_KINDS = {"FLOAT", "DOUBLE", "DECIMAL"}


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        errs = []
        try:
            rel = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
            duck = {d[0]: str(d[1]) for d in zip(
                [c[0] for c in rel.description],
                con.sql(f"SELECT * FROM ({sql}) LIMIT 0").types)}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle errored: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        for col, dt in duck.items():
            base = dt.split("(")[0].strip().upper()
            if base in {"HUGEINT", "UHUGEINT"}:
                errs.append(f"col {col} is {dt} (uncast sum()/'//' — "
                            f"CAST ... AS BIGINT in the final select)")
        try:
            schema = pads.dataset(f"{out_dir}/{name}", format="parquet").schema
            spark = {schema.field(i).name: str(schema.field(i).type)
                     for i in range(len(schema.names))}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark parquet unreadable: {e}")
            n_fail += 1
            continue
        if sorted(spark) != sorted(duck):
            errs.append(f"columns spark={sorted(spark)} duckdb={sorted(duck)}")
        else:
            for col, at in spark.items():
                db = duck[col].split("(")[0].strip().upper()
                if duck[col].endswith("[]") or at.startswith(("list", "large_list", "struct", "map")):
                    continue  # nested: kind check below is N/A
                want = None
                for pre, ok in ARROW_TO_DUCK.items():
                    if at == pre or at.startswith(pre):
                        want = ok
                        break
                if at.startswith("timestamp"):
                    want = {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
                            "TIMESTAMP_NS", "DATE"}
                if want is not None and db not in want:
                    # int-vs-float is the killer asymmetry; name it
                    kind = ("INT-vs-FLOAT " if (
                        (db in INT_KINDS) != (at.startswith(("int", "uint")))
                        and (db in FLOAT_KINDS or at in ("double", "float")))
                        else "")
                    errs.append(f"col {col}: {kind}spark arrow={at} duckdb={duck[col]}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            n_pass += 1
    print(f"\noracle_dtypes: {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
