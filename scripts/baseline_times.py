#!/usr/bin/env python3
"""Wall-time baseline for the "within 2x of BASELINE" gate.

BASELINE.md records that the reference publishes no timing numbers, so the
only measurable single-node baseline on the same data is the committed
DuckDB oracle SQL (SparkEntry.oracleSql) — the exact queries the driver
uses for correctness.  This script times each oracle query in DuckDB
(warmup + min-of-3, same methodology as Bench.scala) on a given sf dir and
writes BASELINE_TIMES.json, which Bench.scala reads to emit per-query and
aggregate spark/duckdb ratios.

Run out-of-band (python + duckdb are driver-side tools, not part of the
Scala library):

    sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/graft_verify_sf01"
    python3 scripts/baseline_times.py /root/testdata/sf0.1 \
        /tmp/graft_verify_sf01/oracle_sql.json BASELINE_TIMES.json

Caveats recorded in the output header: DuckDB runs a fused single-process
vectorized engine with no scheduling layer, while Spark local[32] pays JVM
task scheduling + codegen on every query — at 60k-row scale those fixed
costs dominate, so ratios here are an upper bound that shrinks as data
grows.  The gate reads the aggregate ratio.
"""
import json
import os
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_TIMES.json"
WARMUP = int(os.environ.get("BASELINE_WARMUP", "1"))
REPS = int(os.environ.get("BASELINE_REPS", "3"))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(ORACLE))

times = {}
failed = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        for _ in range(WARMUP):
            con.execute(sql).fetchall()
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    except Exception as e:
        failed.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)

doc = {
    "_meta": {
        # Bench.scala copies this into its env block so every BENCH
        # artifact records which baseline basis produced its ratios
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "engine": f"duckdb {duckdb.__version__}",
        "sf_dir": SF,
        "method": f"warmup={WARMUP},min_of={REPS}",
        "note": ("DuckDB single-process vectorized engine vs Spark "
                 "local[32] JVM with per-query scheduling/codegen fixed "
                 "costs; at small SF the ratio is an upper bound."),
        "n_queries": len(times),
        "n_failed": len(failed),
        "total_sec": round(sum(times.values()), 3),
    },
    "times_sec": times,
}
with open(OUT, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
print(f"wrote {OUT}: {len(times)} queries, total "
      f"{doc['_meta']['total_sec']}s, {len(failed)} failed")
