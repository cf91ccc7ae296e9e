#!/usr/bin/env python3
"""Subset-tolerant twin of parity_check.py (dev harness, not engine
code): same DuckDB-vs-Spark compare, but

- only checks queries whose Verify output dir actually exists (so a
  filtered `graft.Verify ... <names>` run can be checked without the
  absent gates reading as failures), and
- serves tables written as parquet DIRECTORIES (ScaleGen output) as
  well as the driver's single-file layout, creating views only for
  tables present in sfDir.

Used for the sf1 relational-core overflow pass (r15 verdict task 7).

Usage: parity_subset.py <sfDir> <verifyOutDir> [jsonOut]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def rows_of(cols, names):
    data = list(zip(*[cols[n] for n in names])) if names else []
    return sorted((tuple(norm(x) for x in r) for r in data), key=repr)

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    present = [n for n in sorted(oracle)
               if glob.glob(f"{out_dir}/{n}/*.parquet")]
    results = {}
    n_ok = 0
    for name in present:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_t = pq.read_table(files[0])
        got_names = sorted(spark_t.column_names)
        got = {n: spark_t.column(n).to_pylist() for n in got_names}
        try:
            duck_t = con.sql(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            results[name] = {"match": False, "err": str(e)}
            continue
        want_names = sorted(duck_t.column_names)
        want = {n: duck_t.column(n).to_pylist() for n in want_names}
        if got_names != want_names:
            print(f"FAIL {name}: columns spark={got_names} duck={want_names}")
            results[name] = {"match": False, "err": "columns"}
            continue
        def kind(t):
            import pyarrow as pa
            if pa.types.is_integer(t): return "int"
            if pa.types.is_floating(t): return "float"
            if pa.types.is_decimal(t): return "decimal"
            return str(t)
        kinds_bad = [
            (n, kind(spark_t.schema.field(n).type), kind(duck_t.schema.field(n).type))
            for n in got_names
            if kind(spark_t.schema.field(n).type) != kind(duck_t.schema.field(n).type)]
        if kinds_bad:
            print(f"FAIL {name}: column type kinds differ: {kinds_bad}")
            results[name] = {"match": False, "err": f"kinds {kinds_bad}"}
            continue
        gr, wr = rows_of(got, got_names), rows_of(want, want_names)
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duck={len(wr)}")
            results[name] = {"match": False, "err": "rowcount"}
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; "
                  f"first: spark={bad[0][0]} duck={bad[0][1]}")
            results[name] = {"match": False, "err": "values"}
            continue
        print(f"OK   {name} ({len(gr)} rows)")
        results[name] = {"match": True, "rows": len(gr)}
        n_ok += 1
    print(f"== {n_ok}/{len(present)} checked queries match "
          f"({len(oracle) - len(present)} not dumped, skipped)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "checked": len(present),
                       "ok": n_ok, "queries": results}, f, indent=1)

if __name__ == "__main__":
    main(*sys.argv[1:])
