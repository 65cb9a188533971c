#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev only; the
driver runs its own copy). Usage:
    python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]
Reads <out>/<name> parquet dirs + <out>/oracle_sql.json, runs each SQL
in DuckDB over the sf parquet tables, and compares sorted rows.
"""
import json, sys, math
import duckdb, pyarrow.parquet as pq
import glob

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        got = pq.read_table(files[0])
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}"); n_bad += 1; continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"[SCHM] {name}: spark={gcols} duckdb={ecols}"); n_bad += 1; continue
        grows = sorted(tuple(norm(r[c]) for c in gcols) for r in got.to_pylist())
        erows = sorted(tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist())
        if grows == erows:
            print(f"[ OK ] {name}: {len(grows)} rows"); n_ok += 1
        else:
            print(f"[FAIL] {name}: spark {len(grows)} rows vs duckdb {len(erows)}")
            for a, b in list(zip(grows, erows))[:200]:
                if a != b:
                    print(f"   spark : {a}\n   duckdb: {b}")
                    break
            sg = set(grows) - set(erows); se = set(erows) - set(grows)
            if sg: print(f"   only-spark sample: {sorted(sg)[:2]}")
            if se: print(f"   only-duck  sample: {sorted(se)[:2]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
