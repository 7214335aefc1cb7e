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

# The driver's hash is TYPE-sensitive: an oracle column DuckDB types as
# HUGEINT (e.g. an uncast sum() over BIGINT) hash-mismatches a Spark
# BIGINT even when every value is equal (r15: q188/q189/q190). Canonical
# type names let us compare Spark-parquet vs oracle types while ignoring
# spellings that hash identically.
_TYPE_CANON = {
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP", "TIMESTAMP_MS": "TIMESTAMP",
    "TIMESTAMP_S": "TIMESTAMP",
    "FLOAT": "FLOAT", "REAL": "FLOAT",
    # native int widths hash alike (26 driver-green queries pair a Spark
    # INTEGER with an oracle BIGINT); HUGEINT does NOT — it stays distinct
    # and is hard-failed above.
    "TINYINT": "INT", "SMALLINT": "INT", "INTEGER": "INT", "BIGINT": "INT",
    "UTINYINT": "INT", "USMALLINT": "INT", "UINTEGER": "INT",
    "UBIGINT": "INT",
}

def canon_type(t):
    s = str(t).upper()
    return _TYPE_CANON.get(s, s)

def type_errors(name, got_cols, got_types, exp_cols, exp_types):
    """Driver-faithful type checks: no HUGEINT/INT128 on the oracle side,
    and Spark parquet types must match oracle types column-for-column."""
    errs = []
    for c, t in zip(exp_cols, exp_types):
        s = str(t).upper()
        if "HUGEINT" in s or "INT128" in s:
            errs.append(f"oracle col {c} is {s} (uncast sum()? wrap in "
                        "CAST(... AS BIGINT))")
    g = {c: canon_type(t) for c, t in zip(got_cols, got_types)}
    e = {c: canon_type(t) for c, t in zip(exp_cols, exp_types)}
    for c in sorted(set(g) & set(e)):
        if g[c] != e[c]:
            errs.append(f"type mismatch col {c}: spark={g[c]} oracle={e[c]}")
    return errs

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
            got_rel = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
            got_cols, got_types = got_rel.columns, got_rel.types
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols, exp_types = exp_rel.columns, exp_rel.types
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        terrs = type_errors(name, got_cols, got_types, exp_cols, exp_types)
        if terrs:
            print(f"FAIL    {name}: " + "; ".join(terrs))
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
