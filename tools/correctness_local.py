#!/usr/bin/env python3
"""Driver-format correctness artifact from a local Verify dump (dev
evidence only; the driver writes the official CORRECTNESS_r{N}.json).
Usage:
    python3 tools/correctness_local.py <verify_out_dir> <sf_dir> > out.json
Same compare as check_oracle.py (sorted columns, normalized values),
but emits the driver's per-query JSON shape instead of log lines.
"""
import json, sys, math, glob
import duckdb, pyarrow.parquet as pq

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
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    result = {}
    for name, sql in sorted(oracle.items()):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        result[name] = entry
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            entry["err"] = "no spark output"
            continue
        got = pq.read_table(files[0])
        entry["spark_rows"] = got.num_rows
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            entry["err"] = f"duckdb: {e}"
            continue
        entry["oracle_rows"] = exp.num_rows
        entry["rows_match"] = got.num_rows == exp.num_rows
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        entry["schema_match"] = gcols == ecols
        if not entry["schema_match"]:
            continue
        grows = sorted(tuple(norm(r[c]) for c in gcols)
                       for r in got.to_pylist())
        erows = sorted(tuple(norm(r[c]) for c in ecols)
                       for r in exp.to_pylist())
        entry["hash_match"] = grows == erows
    json.dump(result, sys.stdout, indent=2)
    print()
    bad = [n for n, e in result.items()
           if not (e["rows_match"] and e["schema_match"] and e["hash_match"])]
    print(f"== {len(result) - len(bad)} ok, {len(bad)} bad ==",
          file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
