#!/usr/bin/env python3
"""Developer-side parity harness (mimics the driver's correctness gate).

NOT part of the engine: the Scala library has no Python dependency.
This replays what the driver does — run each oracle_sql.json entry in
DuckDB against the same parquet tables, then compare with the Spark
result parquet written by graft.Verify: sort columns by name, sort
rows, compare values exactly.

Usage: parity_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        spark_t = pq.read_table(files[0])
        got_names = sorted(spark_t.column_names)
        got = {n: spark_t.column(n).to_pylist() for n in got_names}
        duck_t = con.sql(oracle[name]).fetch_arrow_table()
        want_names = sorted(duck_t.column_names)
        want = {n: duck_t.column(n).to_pylist() for n in want_names}
        if got_names != want_names:
            print(f"FAIL {name}: columns spark={got_names} duck={want_names}")
            continue
        # Type-KIND parity: the driver hashes typed values, so an int64
        # Spark column vs a hugeint/decimal/double DuckDB column fails
        # there even when Python == says the values agree (500 == 500.0).
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
            print(f"FAIL {name}: column type kinds differ (spark vs duck): {kinds_bad}")
            continue
        gr, wr = rows_of(got, got_names), rows_of(want, want_names)
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duck={len(wr)}")
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            continue
        print(f"OK   {name} ({len(gr)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
