#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the sf tables, load the Spark result parquet written by graft.Verify,
sort columns by name, and compare cell-by-cell.

Usage: oracle_check.py [sfDir] [verifyOutDir]
"""
import duckdb, glob, json, math, os, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows]

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        cur = con.execute(sql)
        ecols = [d[0] for d in cur.description]
        exp = norm_rows(ecols, cur.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
        acols = [d[0] for d in cur.description]
        act = norm_rows(acols, cur.fetchall())
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        n_fail += 1
        continue
    if sorted(ecols) != sorted(acols):
        print(f"FAIL {name}: columns differ: oracle={sorted(ecols)} spark={sorted(acols)}")
        n_fail += 1
        continue
    if len(exp) != len(act):
        print(f"FAIL {name}: row count differ: oracle={len(exp)} spark={len(act)}")
        n_fail += 1
        continue
    bad = None
    for i, (e, a) in enumerate(zip(exp, act)):
        if e != a:
            bad = (i, e, a)
            break
    if bad:
        i, e, a = bad
        print(f"FAIL {name}: row {i} differs (cols sorted {sorted(ecols)}):")
        print(f"  oracle: {e}")
        print(f"  spark : {a}")
        # also check if it's merely row ordering
        if sorted(map(repr, exp)) == sorted(map(repr, act)):
            print("  (same multiset — row ORDER differs)")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed, "
      f"{len(set(glob.glob(OUT + '/*/')) ) - 0} outputs present, "
      f"{len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
