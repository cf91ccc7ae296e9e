#!/usr/bin/env python3
"""Local single-node baseline: time each DuckDB oracle query.

NOT part of the engine (driver-side tooling only). BASELINE.json
publishes no numeric wall time, so the "within 2x of baseline" gate
has no denominator. This script supplies one: DuckDB running the
driver's own oracle SQL on the same parquet at the same SF is a
strong single-node columnar baseline — the ratio spark/duckdb per
query is the honest tuning signal (DuckDB pays no JVM/task-scheduling
overhead, so ratios are expected > 1 on sub-second queries; the flag
threshold is meant for real plan problems, not fixed overhead).

Usage: baseline_local.py <sfDir> <verifyOutDir> [benchJson] > BASELINE_LOCAL.json
  sfDir        testdata dir (parquet tables)
  verifyOutDir graft.Verify output (for oracle_sql.json)
  benchJson    optional bench.json to join spark times against
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, bench_json=None):
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_times = {}
    if bench_json:
        spark_times = json.load(open(bench_json)).get("queries", {})
    times = {}
    for name in sorted(oracle):
        print(f"# timing {name}", file=sys.stderr, flush=True)
        best = None
        err = None
        for _ in range(2):  # min-of-2, like the Spark bench
            # a runaway oracle (e.g. a quadratic CTE at a bigger SF than
            # the gate runs) must not wedge the whole baseline: interrupt
            # after 120s and record -2 (distinguishable from error -1)
            import threading
            fired = threading.Event()

            def watchdog():
                fired.set()
                con.interrupt()

            timer = threading.Timer(120.0, watchdog)
            timer.start()
            t0 = time.time()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception as e:
                err = -2.0 if "INTERRUPT" in str(e).upper() else -1.0
                print(f"#   {name}: {e}"[:200], file=sys.stderr, flush=True)
                break
            finally:
                timer.cancel()
                # cancel() doesn't stop an ALREADY-RUNNING watchdog:
                # join() waits for any in-flight action to finish so
                # fired reflects reality before we check it
                timer.join()
                # the interrupt can fire BETWEEN query completion and
                # cancel(), poisoning the shared connection for the
                # NEXT oracle — if it fired, drain it with a throwaway
                # statement so the pending interrupt lands here
                if fired.is_set():
                    try:
                        con.sql("SELECT 1").fetchall()
                    except Exception:
                        pass
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        # a successful attempt's time is kept even when a later
        # attempt errors/times out; error sentinels only when NO
        # attempt succeeded
        times[name] = round(best, 4) if best is not None else err
    total = sum(v for v in times.values() if v >= 0)
    ratios = {}
    for name, d in times.items():
        s = spark_times.get(name)
        if s is not None and s > 0 and d > 0:
            ratios[name] = round(s / d, 2)
    out = {
        "metric": "duckdb_oracle_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf_dir,
        "queries": times,
        "spark_over_duckdb": ratios,
    }
    print(json.dumps(out, indent=1))
    # flag = ratio > 2x AND absolute delta > 0.5s: sub-second queries
    # are dominated by Spark's fixed per-query overhead (task launch,
    # codegen) that a 32-thread in-process engine doesn't pay — a 20x
    # ratio on an 0.1s query is overhead, not a plan problem.
    flagged = sorted((spark_times[n] - times[n], n) for n, r in ratios.items()
                     if r > 2.0 and spark_times[n] - times[n] > 0.5)
    if flagged:
        print(f"# {len(flagged)} queries >2x DuckDB AND >0.5s slower:",
              file=sys.stderr)
        for d, n in reversed(flagged):
            print(f"#   {n}: {ratios[n]}x (spark {spark_times[n]}s vs "
                  f"duck {times[n]}s, +{d:.2f}s)", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
