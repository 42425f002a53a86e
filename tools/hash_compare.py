#!/usr/bin/env python3
"""Determinism probe: hash-compare two graft.Verify output dirs.

The exact-match bar (BASELINE.json) requires every query's result to be
IDENTICAL at any parallelism — run Verify twice (e.g. SPARK_GRAFT_CPUS=4
and =8) into two dirs and compare:

    python3 tools/hash_compare.py /tmp/out_cpus4 /tmp/out_cpus8

For each query subdir, loads the parquet via DuckDB, sorts columns by name
and rows by value, and sha256-hashes the canonical text — the same
canonicalization idea as the driver gate (column-name sort + value hash).
Exit 0 iff every query matches in both dirs.
"""
import hashlib
import os
import sys

import duckdb


def query_dirs(root):
    return sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))


def table_hash(con, path):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    ordered = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.execute(
        f"SELECT {ordered} FROM '{path}/*.parquet' ORDER BY ALL").fetchall()
    h = hashlib.sha256()
    h.update(repr(sorted(cols)).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest(), len(rows)


def main():
    a, b = sys.argv[1], sys.argv[2]
    qa, qb = query_dirs(a), query_dirs(b)
    if qa != qb:
        print(f"FAIL query sets differ: only-in-a={set(qa)-set(qb)} "
              f"only-in-b={set(qb)-set(qa)}")
        return 1
    con = duckdb.connect()
    bad = 0
    for q in qa:
        ha, na = table_hash(con, os.path.join(a, q))
        hb, nb = table_hash(con, os.path.join(b, q))
        if ha == hb:
            print(f"MATCH {q}: rows={na}")
        else:
            bad += 1
            print(f"FAIL  {q}: rows {na} vs {nb}, hashes differ")
    print(f"== match={len(qa) - bad} mismatch={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
