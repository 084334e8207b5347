#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over the sfDir
tables, and compares: schema (column names sorted), row count, and
values (rows sorted, columns sorted by name). Reports exact and
approx (float-tolerant) match separately so FP-risk shows up early.
"""
import duckdb, json, math, sys, glob, os
from decimal import Decimal

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v))
    return ("v", str(v))

def fetch_sorted(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    rows.sort(key=lambda r: tuple((t, str(x)) for t, x in r))
    return sorted(cols), rows

def approx_eq(a, b):
    if a == b:
        return True
    if a[0] == "num" and b[0] == "num":
        x, y = a[1], b[1]
        if x == y:
            return True
        if math.isnan(x) and math.isnan(y):
            return True
        return abs(x - y) <= 1e-6 * max(1.0, abs(x), abs(y))
    return False

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_glob = glob.glob(f"{OUT}/{name}/*.parquet")
    if not res_glob:
        print(f"FAIL {name}: no result parquet written")
        fails += 1
        continue
    try:
        ecols, erows = fetch_sorted(con.execute(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    gcols, grows = fetch_sorted(con.execute(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')"))
    if [c.lower() for c in ecols] != [c.lower() for c in gcols]:
        print(f"FAIL {name}: columns differ  oracle={ecols}  got={gcols}")
        fails += 1
        continue
    if len(erows) != len(grows):
        print(f"FAIL {name}: row count oracle={len(erows)} got={len(grows)}")
        fails += 1
        continue
    exact = erows == grows
    approx = exact or all(
        all(approx_eq(a, b) for a, b in zip(er, gr))
        for er, gr in zip(erows, grows))
    if exact:
        print(f"PASS {name}: {len(erows)} rows exact")
    elif approx:
        print(f"WARN {name}: {len(erows)} rows approx-only (FP drift risk!)")
        for er, gr in list(zip(erows, grows))[:3]:
            if er != gr:
                print(f"    oracle={er}\n    got   ={gr}")
                break
    else:
        print(f"FAIL {name}: values differ ({len(erows)} rows)")
        shown = 0
        for er, gr in zip(erows, grows):
            if not all(approx_eq(a, b) for a, b in zip(er, gr)):
                print(f"    oracle={er}\n    got   ={gr}")
                shown += 1
                if shown >= 3:
                    break
        fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} "
      f"({len(oracle)} oracle-checked queries)")
sys.exit(1 if fails else 0)
