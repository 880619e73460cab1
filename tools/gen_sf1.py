"""Replicate /root/testdata/sf0.1 MULT× (default 10 → "sf1") with
disjoint key spaces, for the core-count scaling A/B (VERDICT r15 #5).

sf0.1 is ~11 MB of lineitem — every bench query is fixed-cost-bound at
that size (PERF_r15 scaling block: most 8c/32c ratios ≈ 1), so it cannot
demonstrate shuffle-path scaling. This generator replicates each sf0.1
table MULT times, offsetting every key column by copy_index ×
(max_key + 1) so per-key cardinalities, join fan-outs, and value
distributions are EXACTLY those of the driver data — only the row count
grows. Dimension leaves (nation, region) stay single-copy; each copy's
fact rows point at that copy's customer/supplier/part rows.

Derived data: writes /tmp/spark_graft_sf1 (or --out DIR), snappy to
match the driver files' codec; never touches /root/testdata.
Deterministic (pure key arithmetic, no RNG). Usage:

    python tools/gen_sf1.py [--mult N] [--out DIR]
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    import duckdb

    mult = 10
    out = "/tmp/spark_graft_sf1"
    argv = sys.argv[1:]
    if "--mult" in argv:
        mult = int(argv[argv.index("--mult") + 1])
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def kmax(table: str, col: str) -> int:
        return int(
            con.execute(
                f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )

    k_ord = kmax("orders", "o_orderkey") + 1
    k_cust = kmax("customer", "c_custkey") + 1
    k_supp = kmax("supplier", "s_suppkey") + 1
    k_part = kmax("part", "p_partkey") + 1
    k_doc = kmax("documents", "doc_id") + 1
    k_vec = kmax("embeddings", "vec_id") + 1
    k_evt = kmax("events", "event_id") + 1
    k_user = kmax("events", "user_id") + 1

    # (table, {key_col: stride}) — every other column copied verbatim
    plans = {
        "lineitem": {"l_orderkey": k_ord, "l_partkey": k_part, "l_suppkey": k_supp},
        "orders": {"o_orderkey": k_ord, "o_custkey": k_cust},
        "customer": {"c_custkey": k_cust},
        "supplier": {"s_suppkey": k_supp},
        "part": {"p_partkey": k_part},
        "documents": {"doc_id": k_doc},
        "embeddings": {"vec_id": k_vec},
        "events": {"event_id": k_evt, "user_id": k_user},
    }
    for table, strides in plans.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i.range * {strides[c]} AS {c}" if c in strides else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{table}.parquet') "
            f"CROSS JOIN range({mult}) i ORDER BY i.range) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet, CODEC snappy)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"wrote {out}/{table}.parquet ({n} rows)", flush=True)
    for table in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet, CODEC snappy)"
        )
        print(f"wrote {out}/{table}.parquet (single copy)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
