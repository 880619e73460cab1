"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor and
compares against ``oracle_sql()`` via DuckDB: row count, column-name set,
and order-insensitive value comparison (exact after the contract's rounding
rules). Queries without an oracle get a rows-only check.

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--json OUT.json]

``--json`` writes per-query results in the driver's CORRECTNESS format
(rows/schema/hash matches + row counts + err) so every round's full local
run is committed as durable evidence alongside the driver's sample.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from data_engineering_capstone_project__spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple]) -> list[tuple]:
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                # exact (bit-level) comparison — the contract guarantees
                # engine-identical IEEE arithmetic via fx.pround
                vals.append("NaN" if math.isnan(v) else v)
            elif isinstance(v, bool):
                vals.append(bool(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark(app_name="check_oracle")
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}

    def record(name, **kw):
        results[name] = {
            "rows_match": kw.get("rows_match"),
            "schema_match": kw.get("schema_match"),
            "hash_match": kw.get("hash_match"),
            "spark_rows": kw.get("spark_rows"),
            "oracle_rows": kw.get("oracle_rows"),
            "err": kw.get("err"),
            "secs": kw.get("secs"),
            "rows_only": kw.get("rows_only", False),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            record(name, err=f"spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        secs = round(time.time() - t0, 1)
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, {secs}s)")
            record(name, rows_match=True, spark_rows=len(srows), secs=secs,
                   rows_only=True)
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in res.description]
            drows_raw = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            record(name, spark_rows=len(srows),
                   err=f"duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck_cols_raw)
        if spark_cols != duck_cols:
            print(f"FAIL  {name}: columns {spark_cols} != {duck_cols}")
            record(name, rows_match=None, schema_match=False,
                   spark_rows=len(srows), oracle_rows=len(drows_raw),
                   err="schema mismatch")
            n_fail += 1
            continue
        reorder = [duck_cols_raw.index(c) for c in duck_cols]
        drows = [tuple(r[i] for i in reorder) for r in drows_raw]
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            record(name, rows_match=False, schema_match=True,
                   spark_rows=len(srows), oracle_rows=len(drows),
                   err="rowcount mismatch")
            n_fail += 1
            continue
        a, b = normalize(srows), normalize(drows)
        if a != b:
            bad = next(
                (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
            )
            print(f"FAIL  {name}: value mismatch at sorted-row {bad[0]}:")
            print(f"        spark: {bad[1]}")
            print(f"        duck : {bad[2]}")
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(srows), oracle_rows=len(drows),
                   err="value mismatch")
            n_fail += 1
            continue
        secs = round(time.time() - t0, 1)
        print(f"PASS  {name} ({len(srows)} rows, {secs}s)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(srows), oracle_rows=len(drows), secs=secs)
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
