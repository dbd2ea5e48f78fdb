#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Round-1 lesson (VERDICT.md): the driver does NOT compare Python values.
It loads the Spark result parquet with *pandas*, runs the oracle SQL in
DuckDB fetching a *pandas* frame, sorts columns by name, sorts rows with
``DataFrame.sort_values`` over every column, and hashes the *rendered*
(stringified) cells.  That means:

  - Decimal(38,6) cells render "123.450000" on the Spark side but come
    back float64 "123.45" from DuckDB -> hash mismatch even though the
    values are equal.
  - array/map cells are numpy ndarrays -> ``sort_values`` raises
    ``TypeError: unhashable type`` -> the query can never pass.

This replica reproduces that pipeline exactly so local green predicts
driver green.  Queries present in the verify out dir but absent from
oracle_sql.json get the driver's weaker rows-only treatment, which still
requires the frame to be *sortable* (no ndarray cells).

Usage: oracle_check.py [sfDir] [verifyOutDir]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Scale-sweep knobs (defaults = DuckDB's own): at sf10 the l26 oracle's
# 60M-row join chain spilled >59 GB of temp and died on disk; capping
# threads and raising the memory limit keeps the intermediates in RAM
# on this 125 GB box.
if os.environ.get("GRAFT_ORACLE_MEM"):
    con.execute(f"SET memory_limit = '{os.environ['GRAFT_ORACLE_MEM']}'")
if os.environ.get("GRAFT_ORACLE_THREADS"):
    con.execute(f"SET threads = {int(os.environ['GRAFT_ORACLE_THREADS'])}")
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def rendered(df):
    """Driver-style canonical form: columns sorted by name, rows sorted by
    every column, every cell rendered to its string form."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="last")
    df = df.reset_index(drop=True)
    return df.astype(str)


def load_spark(name):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


n_pass = n_fail = n_skip = 0
present = {os.path.basename(d.rstrip("/"))
           for d in glob.glob(OUT + "/*/")}

# GRAFT_ORACLE_SKIP=l39 (comma-separated name prefixes): mirror of
# Verify's SPARK_GRAFT_VERIFY_SKIP for scale sweeps — a query excluded
# from the Spark dump must be reported as SKIP, not FAIL, and every
# skip must be ledgered in the artifact citing the sweep.
skip = [s for s in os.environ.get("GRAFT_ORACLE_SKIP", "").split(",") if s]

# Past this row count the pandas comparator (load both sides, stringify
# every cell, sort rows by every column) no longer fits in memory — at
# sf10 s1_scan_lineitem alone is 60M wide rows, ~60 GB of python strings
# PER SIDE. Big outputs switch to a DuckDB-side ORDER-INDEPENDENT
# multiset compare: both sides (the Spark parquet, read by DuckDB, and
# the oracle result) are rendered to VARCHAR by the SAME engine, each
# row hashed, and {count, sum(hash)} compared — exact multiset equality
# under identical rendering, no sort, no materialized strings. The
# driver's own gate runs at sf0.01 where the pandas path always applies;
# this branch exists for the out-of-band sfN sweeps.
BIG_ROWS = int(os.environ.get("GRAFT_ORACLE_BIG_ROWS", "4000000"))


def spark_rel(name):
    return f"read_parquet('{OUT}/{name}/*.parquet')"


def multiset_sig(rel_sql):
    """(n_rows, accumulators, sorted columns) for a relation.

    r13 (ADVICE): two hardenings over the r12 (count, SUM(hash)) form.
    (1) Cells render with an explicit LENGTH PREFIX before joining, so a
    cell whose text contains the joiner/NULL sentinel bytes cannot forge
    another row's rendering (documents.text flows into some big outputs).
    (2) Beside the commutative SUM (which admits cancellation between
    pairs of differing rows), a second independent accumulator —
    bit_xor(hash) — must also match; a discrepancy would need to cancel
    under BOTH group operators simultaneously.
    """
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM {rel_sql}").fetchall()]
    rendered = " || ".join(
        "COALESCE("
        f"concat(CAST(length(CAST(\"{c}\" AS VARCHAR)) AS VARCHAR), ':', "
        f"CAST(\"{c}\" AS VARCHAR)), 'N')" for c in sorted(cols))
    n, hsum, hxor = con.execute(
        f"SELECT count(*), COALESCE(SUM(hash({rendered})), 0), "
        f"COALESCE(bit_xor(hash({rendered})), 0) "
        f"FROM {rel_sql}").fetchone()
    return n, (hsum, hxor), sorted(cols)


for name in sorted(present | set(oracle)):
    if any(name.startswith(s) for s in skip):
        print(f"SKIP {name} (scale-excluded by GRAFT_ORACLE_SKIP)")
        n_skip += 1
        continue
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if files:
        n_spark_rows = con.execute(
            f"SELECT count(*) FROM {spark_rel(name)}").fetchone()[0]
        if n_spark_rows > BIG_ROWS:
            if name not in oracle:
                # r13 (ADVICE): the rows-only BIG branch must still
                # prove the output is driver-renderable — the pandas
                # path enforces sortability/renderability as a
                # harness-crash predictor, so exercise the identical
                # contract on a bounded sample before declaring PASS.
                try:
                    sample = con.execute(
                        f"SELECT * FROM {spark_rel(name)} LIMIT 1000").df()
                    rendered(sample)
                except Exception as e:
                    print(f"FAIL {name}: BIG rows-only sample not "
                          f"sortable/renderable (driver harness would "
                          f"crash): {type(e).__name__}: {e}")
                    n_fail += 1
                    continue
                print(f"PASS {name} (rows-only BIG, {n_spark_rows} rows, "
                      f"1000-row render sample)")
                n_pass += 1
                continue
            try:
                an, ah, acols = multiset_sig(spark_rel(name))
                en, eh, ecols = multiset_sig(f"({oracle[name]})")
            except Exception as e:
                print(f"FAIL {name}: multiset compare error: {e}")
                n_fail += 1
                continue
            if acols != ecols:
                print(f"FAIL {name}: columns differ: oracle={ecols} spark={acols}")
                n_fail += 1
            elif (an, ah) != (en, eh):
                print(f"FAIL {name}: multiset differs: "
                      f"oracle=({en},{eh}) spark=({an},{ah})")
                n_fail += 1
            else:
                print(f"PASS {name} ({an} rows, duckdb-multiset)")
                n_pass += 1
            continue
    spark_df = load_spark(name)
    if spark_df is None:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        act = rendered(spark_df)
    except Exception as e:
        print(f"FAIL {name}: spark output not sortable/renderable "
              f"(driver harness would crash): {type(e).__name__}: {e}")
        n_fail += 1
        continue
    if name not in oracle:
        # driver records a weaker rows-only check; sortability verified above
        print(f"PASS {name} (rows-only, {len(act)} rows)")
        n_pass += 1
        continue
    try:
        exp = rendered(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    if sorted(exp.columns) != sorted(act.columns):
        print(f"FAIL {name}: columns differ: oracle={sorted(exp.columns)} "
              f"spark={sorted(act.columns)}")
        n_fail += 1
        continue
    if len(exp) != len(act):
        print(f"FAIL {name}: row count differ: oracle={len(exp)} spark={len(act)}")
        n_fail += 1
        continue
    if exp.equals(act):
        print(f"PASS {name} ({len(exp)} rows)")
        n_pass += 1
        continue
    neq = (exp != act)
    bad_cells = neq.to_numpy().nonzero()
    i, j = bad_cells[0][0], bad_cells[1][0]
    coln = exp.columns[j]
    print(f"FAIL {name}: {int(neq.to_numpy().sum())} rendered cells differ; "
          f"first at row {i} col {coln!r}:")
    print(f"  oracle: {exp.iloc[i, j]!r}")
    print(f"  spark : {act.iloc[i, j]!r}")
    n_fail += 1

skipped = f", {n_skip} skipped" if n_skip else ""
print(f"\n{n_pass} passed, {n_fail} failed{skipped} "
      f"({len(oracle)} oracles, {len(present)} outputs)")
sys.exit(1 if n_fail else 0)
