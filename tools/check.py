#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs DuckDB oracle SQL against the sf parquet tables and compares against
the parquet that graft.Verify dumped: columns sorted by name, rows sorted
by all columns, exact value equality (NaN==NaN, None==None).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def canon(rows, names):
    # lower() so both sides canonicalize identically even when column-name
    # case differs between Spark and DuckDB (schema compare is lowercased).
    order = sorted(range(len(names)), key=lambda i: names[i].lower())
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_names, exp_rows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_raw = got.fetchall()
            got_names, got_rows = canon(got_raw, got.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # The DRIVER's comparator sorts rows via pandas and crashes on
        # list/array cells (r8: q68/q72 shipped `err`). This replica used
        # to stringify them — a local PASS the driver could never grade.
        # Mirror the driver: non-scalar cells are a hard FAIL here too.
        if got_raw and any(isinstance(v, (list, tuple, dict)) for v in got_raw[0]):
            bad = [got.columns[i] for i, v in enumerate(got_raw[0])
                   if isinstance(v, (list, tuple, dict))]
            print(f"FAIL {name}: non-scalar output columns {bad} — the "
                  "driver's comparator cannot sort these; explode or project to scalars")
            n_fail += 1
            continue
        if [n.lower() for n in exp_names] != [n.lower() for n in got_names]:
            print(f"FAIL {name}: schema {got_names} != oracle {exp_names}")
            n_fail += 1
        elif exp_rows != got_rows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n   oracle={a}\n   spark ={b}")
                    break
            else:
                if len(exp_rows) != len(got_rows):
                    print(f"  row-count mismatch only")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
