#!/usr/bin/env python3
"""Scale-up generator for the 100x sweep (validation data only).

Produces an sfN-shaped directory by unioning K key-shifted copies of
the driver's sf0.1 tables (deterministic — no RNG). Foreign keys shift
together (lineitem.l_orderkey and orders.o_orderkey get the same
offset per copy) so join cardinalities scale linearly; dims (region,
nation) stay fixed like real TPC-H. Both the Spark engine and the
DuckDB oracle read the SAME generated files, so hash-match validation
is as strong as at the driver's scale factors. NOT used by any gated
query — the driver's /root/testdata stays the only gate input.

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 tmp/sf1 10
"""
import sys

import duckdb

# per-copy key offsets, chosen far above the sf0.1 key ranges so the
# shifted id spaces never collide
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_AS_IS = ["region", "nation"]


def main():
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i.i * {shifts[c]} AS {c}" if c in shifts else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"generate_series(0, {k - 1}) i(i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k} copies)")


if __name__ == "__main__":
    main()
