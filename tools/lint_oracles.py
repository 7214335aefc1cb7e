#!/usr/bin/env python3
"""Driver-faithful oracle type lint: type every SparkEntry.oracleSql
query through DuckDB `LIMIT 0` and fail on any HUGEINT/INT128 column in
the FINAL schema — the exact class that hash-mismatches the driver's
type-sensitive compare even when all values are equal (r15: q188-q190).

Fast loop (no Verify run of the queries needed — just the SQL dump):
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/v zzz_none"
  python3 tools/lint_oracles.py /tmp/v/oracle_sql.json /root/testdata/sf0.01

(Dev tool only — the engine itself has no Python dependency.)
"""
import sys, os, json, duckdb

def main(oracle_json, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:
            print(f"ERR     {name}: {str(e)[:160]}")
            n_bad += 1
            continue
        for c, t in zip(rel.columns, rel.types):
            s = str(t).upper()
            if "HUGEINT" in s or "INT128" in s:
                print(f"HUGEINT {name}.{c} — wrap the aggregate in "
                      "CAST(... AS BIGINT)")
                n_bad += 1
    print(f"{len(oracle)} oracles typed, {n_bad} problems")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
