#!/usr/bin/env python3
"""Synthesize an sfN-class dataset by key-remapped replication of sf0.1.

Round-11 verdict #1: FLOORS.md's central argument — per-query constants
and JVM row-work premiums amortize with data volume, so the sf0.1 ratios
are upper bounds — was extrapolated from sf0.001→0.01→0.1 marginals.
This script manufactures the next decade so the claim can be MEASURED:
a same-day bracketed Spark/DuckDB pairing of the headline shapes plus
the entire >2× residual set at ~sf1 (6M-row lineitem).

Synthesis (deterministic, no RNG — the replica index is the only new
information):
  - region/nation: unchanged (dimensions; TPC-H holds them constant).
  - Every other table is the UNION of REPLICAS copies, replica i
    offsetting each surrogate key by i * OFFSET (OFFSET = 10^9, far
    above any sf0.1 key). Foreign keys shift by the SAME offset, so
    every FK join finds exactly its replica's parent — join
    selectivities, group cardinalities (×10 groups for key-grained
    groups, same per-group sizes), and value distributions are
    preserved; distribution-grained groups (returnflag, event_type,
    time buckets) keep their group COUNT and grow ×10 per group, which
    is what a real decade of data does to them.
  - Timestamps/dates are kept as-is: ×10 density per day/time-bucket,
    the same window-count the window/event queries see in production
    as volume grows.
  - documents/embeddings: text/vectors are replicated VERBATIM under
    remapped ids — at this scale the corpus is 90% exact duplicates by
    construction, a realistic (if extreme) crawl-dedup workload. The
    pairing set below doesn't include the LSH-clique near-dup queries,
    whose candidate-pair counts would be dominated by this synthetic
    cliquing rather than engine behavior; per-doc queries (l20
    winnowing, l36 LM score, l38 DSIR) are unaffected.

DuckDB writes parquet with row-group sizes Spark reads fine; events.ts
round-trips as TIMESTAMP (µs) — graft.Tables normalizes any encoding to
epoch-nano longs, and the DuckDB oracle reads the same file, so both
engines see identical values.

Usage:
    python3 scripts/synth_scale.py [SRC_DIR] [DST_DIR] [REPLICAS]
    # defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 10 ** 9

# table -> columns to offset by replica * OFFSET (surrogate + foreign keys)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads = {min(32, os.cpu_count() or 8)}")

for t in VERBATIM:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied verbatim")

for t, keys in KEYED.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
    proj = ", ".join(
        f"{c} + r.i * {OFFSET} AS {c}" if c in keys else c for c in cols)
    con.execute(
        f"COPY (SELECT {proj} "
        f"      FROM read_parquet('{SRC}/{t}.parquet') "
        f"      CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({REPLICAS} replicas, keys {keys})")

print(f"done -> {DST}")
