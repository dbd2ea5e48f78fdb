#!/usr/bin/env python3
"""Synthesize an sfN-class dataset by key-remapped replication of sf0.1.

Round-11 verdict #1: FLOORS.md's central argument — per-query constants
and JVM row-work premiums amortize with data volume, so the sf0.1 ratios
are upper bounds — was extrapolated from sf0.001→0.01→0.1 marginals.
This script manufactures the next decades so the claim can be MEASURED.

Round-12 fix (r11 verdict "Next round" #1): text and embeddings are no
longer replicated VERBATIM.  Verbatim replication made the corpus 90%+
exact duplicates by construction, so pair/clique-bounded ops (l14's
prefix blocks, l1c's inverted index, l34's cross-source grams, LSH
cliques) grew QUADRATICALLY in the replica count — a synthesis artifact,
not engine behavior, which blocked the full-suite sf10 pairing.  Now
each replica i applies a deterministic content bijection:

  - documents.text: an affine substitution cipher per replica —
    letter c → (a·c + b) mod 26 with a = COPRIMES[(i/26) mod 12],
    b = i mod 26 (digits shift by i mod 10; case preserved).  Replica 0
    is the identity (a=1, b=0), so the original sf0.1 corpus is a
    subset and doc_id-sliced queries (l23 doc_id<150, l25 doc_id<300)
    see byte-identical inputs at every SF.  The cipher is a bijection
    on characters, hence on tokens and on n-grams: WITHIN a replica the
    whole similarity structure (token/gram Jaccard, exact-dup families,
    edit-distance blocks, winnowing spans) is preserved EXACTLY, while
    ACROSS replicas token/gram overlap collapses to ~zero (two distinct
    affine maps agree on a whole word only by collision).  Lengths are
    preserved character-for-character, so n_chars stays consistent and
    per-doc kernels (l20/l36/l38) do identical work.  (i, cipher) is
    injective for i < 312 — asserted below.
  - embeddings.embedding: rotate coordinates by i mod dim and negate
    when (i/dim) is odd.  Both transforms preserve norms and all
    WITHIN-replica cosine similarities exactly (same map applied to
    every vector of the replica); across replicas the dot pairs
    unrelated coordinates, so near-dup thresholds are no longer met by
    construction.  Replica 0 is the identity passthrough (bit-exact).
    (i, transform) is injective for i < 2·dim = 128 — asserted below.
  - Vocabulary SHAPE is preserved (each replica's vocab is the same
    size with the same frequency profile); the UNION vocabulary grows
    ~linearly with replicas, which is the direction a real decade of
    crawl data moves (new sources bring new vocabulary).  Content
    semantics that key on real words (stopword lists, langid n-grams)
    see cipher-text for replicas i>0 — both engines read the same
    files, so pairings and oracles are unaffected; only the HIT RATE of
    word-list heuristics drops, which shrinks (never inflates) the
    downstream work those queries feed.

Base synthesis (unchanged from round 11; deterministic, no RNG — the
replica index is the only new information):
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

# a values coprime to 26 — index 0 is 1 so replica 0 is the identity map
COPRIMES = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
assert REPLICAS <= 26 * len(COPRIMES), "cipher (a,b) space exhausted"
# r13 (ADVICE): the embedding transform space is 2*dim (dim rotations x
# sign flip) and the SQL transform uses len(embedding) at runtime — read
# the ACTUAL dimension from the source parquet instead of assuming 64,
# so a regenerated corpus with a narrower embedding can never silently
# wrap replica i = 2*dim back to the identity map (which would
# reintroduce the verbatim-duplicate quadratic this script exists to
# prevent).
_dim_con = duckdb.connect()
_emb_dim = _dim_con.execute(
    f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') "
    "WHERE embedding IS NOT NULL LIMIT 1").fetchone()
_dim_con.close()
assert _emb_dim is not None, "embeddings.parquet has no non-null vector"
assert REPLICAS <= 2 * _emb_dim[0], (
    f"embedding (rotation, sign) space exhausted "
    f"(dim={_emb_dim[0]}, max replicas={2 * _emb_dim[0]})")

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def cipher_pair(i: int):
    """(src, dst) translate alphabets for replica i; identity for i=0."""
    a = COPRIMES[(i // 26) % len(COPRIMES)]
    b = i % 26
    lo = "".join(LOWER[(a * k + b) % 26] for k in range(26))
    up = "".join(UPPER[(a * k + b) % 26] for k in range(26))
    dg = "".join(DIGIT[(k + i) % 10] for k in range(10))
    return LOWER + UPPER + DIGIT, lo + up + dg


# injectivity guard: no two replicas share a text transform
assert len({cipher_pair(i)[1] for i in range(REPLICAS)}) == REPLICAS

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads = {min(32, os.cpu_count() or 8)}")

# replica-indexed cipher map joined into the documents projection
con.execute("CREATE TEMP TABLE cipher (i INTEGER, src VARCHAR, dst VARCHAR)")
con.executemany("INSERT INTO cipher VALUES (?, ?, ?)",
                [(i, *cipher_pair(i)) for i in range(REPLICAS)])

# per-column projection overrides applied on top of the key offsets;
# expressions may reference r.i (replica index) and c.* (cipher row)
TRANSFORMS = {
    "documents": {
        "text": ("CASE WHEN r.i = 0 THEN text "
                 "ELSE translate(text, c.src, c.dst) END AS text"),
    },
    "embeddings": {
        "embedding": (
            "CASE WHEN r.i = 0 THEN embedding ELSE CAST(list_transform("
            "  list_slice(embedding, (r.i % len(embedding)) + 1, len(embedding))"
            "  || list_slice(embedding, 1, r.i % len(embedding)),"
            "  e -> e * (CASE WHEN (r.i // len(embedding)) % 2 = 1"
            "            THEN -1 ELSE 1 END)) AS FLOAT[]) END AS embedding"),
    },
}

for t in VERBATIM:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied verbatim", flush=True)

for t, keys in KEYED.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
    over = TRANSFORMS.get(t, {})
    proj = ", ".join(
        over.get(c, f"{c} + r.i * {OFFSET} AS {c}" if c in keys else c)
        for c in cols)
    join = "JOIN cipher c ON c.i = r.i" if t in TRANSFORMS else ""
    con.execute(
        f"COPY (SELECT {proj} "
        f"      FROM read_parquet('{SRC}/{t}.parquet') "
        f"      CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r {join}) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({REPLICAS} replicas, keys {keys})", flush=True)

print(f"done -> {DST}")
