#!/usr/bin/env python3
"""Replicates the driver's correctness gate locally: runs graft.Verify's
parquet dumps against DuckDB executions of oracle_sql.json on the same
testdata tables, comparing row counts, sorted-column names, and a hash of
the value multiset. Usage: selfcheck.py <sfDir> <verifyOutDir>.

(Uses duckdb/pyarrow, which ship for the driver-side oracle only — this
script is tooling, not part of the library.)"""
import sys, os, json, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"ROWSONLY {name}: rows={len(got)}")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(got_cols) == sorted(exp_cols)
        ok_rows = len(got) == len(exp)
        ok_hash = ok_schema and table_hash(got_cols, got) == table_hash(exp_cols, exp)
        if ok_schema and ok_rows and ok_hash:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, "
                  f"schema {sorted(got_cols)} vs {sorted(exp_cols)}, hash_ok={ok_hash}")
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
