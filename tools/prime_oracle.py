#!/usr/bin/env python3
"""Budget-free oracle priming (dev-only, driver-side python).

Runs one query's oracle SQL against an SF dir and stages the result in
the sweep's oracle cache (check.py's run_oracle layout, key imported
from check.py so the two can never drift). A QUADRATIC-skipped query
whose oracle is primed here sweeps as a REAL checked row — the skip
exists because the inline DuckDB replay exceeds the sweep budget, not
because the comparison is infeasible. Wall time is printed so a
measured abandonment can be documented when priming itself is the
infeasible part (the q88 precedent).

Usage: python3 tools/prime_oracle.py <sf_dir> <oracle_sql.json> <cache_dir> <name> [threads]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, run_oracle  # noqa: E402

import duckdb  # noqa: E402


def main():
    sf_dir, sql_path, cache_dir, name = sys.argv[1:5]
    threads = sys.argv[5] if len(sys.argv) > 5 else "8"
    sql = json.load(open(sql_path))[name]
    os.environ["GRAFT_ORACLE_CACHE"] = cache_dir
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    t0 = time.time()
    df = run_oracle(con, sf_dir, sql)
    print(f"PRIMED {name}: rows={len(df)} wall={time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
