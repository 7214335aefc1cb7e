#!/usr/bin/env python3
"""Local dev loop mimicking the driver's correctness gate: run
graft.Verify output against DuckDB oracles and diff.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
(Dev tool only — the engine itself has no Python dependency.)
"""
import sys, os, json, duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING {name}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{spark_path}/*.parquet' LIMIT 0").description]
            exp = con.sql(sql).fetchall()
            exp_cols = [d[0] for d in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").description]
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL    {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
        elif g == e:
            print(f"ok      {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted(map(repr, g)) == sorted(map(repr, e)):
            print(f"ok*     {name} ({len(g)} rows, order differs)")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL    {name}: {len(g)} vs {len(e)} rows; first diffs: {diff}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
