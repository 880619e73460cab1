"""Deterministic query fuzzing vs DuckDB: seeded-random filter+aggregate
queries over lineitem, executed on both engines and compared exactly.

A miniature SQLsmith for the operator surface the engine composes most:
conjunctive predicates (range / equality / IN / LIKE), group-by choice,
and the sum/avg/min/max/count aggregate family with parity rounding.
25 seeded cases == 25 extra oracle queries every run, shapes nobody
hand-picked.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.functions.fx import pround

SF_DIR = "/root/testdata/sf0.001"

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
CAT_COLS = ["l_returnflag", "l_linestatus"]


def _gen_case(rng: random.Random):
    """One random case: (spark_predicate_builder, sql_predicate, group_col,
    agg_col)."""
    preds_sql = []
    preds_spark = []
    n_preds = rng.randint(1, 3)
    for _ in range(n_preds):
        kind = rng.choice(["range", "eq", "in", "like"])
        if kind == "range":
            c = rng.choice(NUMERIC_COLS + KEY_COLS)
            lo = rng.randint(0, 50)
            preds_sql.append(f"{c} >= {lo}")
            preds_spark.append(F.col(c) >= lo)
        elif kind == "eq":
            c = rng.choice(CAT_COLS)
            v = rng.choice(["R", "F", "P", "O", "N", "A"])
            preds_sql.append(f"{c} = '{v}'")
            preds_spark.append(F.col(c) == v)
        elif kind == "in":
            c = rng.choice(KEY_COLS)
            vals = sorted(rng.sample(range(1, 2000), rng.randint(2, 5)))
            preds_sql.append(f"{c} IN ({', '.join(map(str, vals))})")
            preds_spark.append(F.col(c).isin(*vals))
        else:
            c = rng.choice(CAT_COLS)
            v = rng.choice("RFPONA")
            preds_sql.append(f"{c} LIKE '%{v}%'")
            preds_spark.append(F.col(c).like(f"%{v}%"))
    group = rng.choice(CAT_COLS + [None])
    agg = rng.choice(NUMERIC_COLS)
    return preds_spark, preds_sql, group, agg


@pytest.mark.parametrize("seed", range(25))
def test_fuzzed_filter_agg_matches_duckdb(spark, seed):
    rng = random.Random(1000 + seed)
    preds_spark, preds_sql, group, agg = _gen_case(rng)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cond = preds_spark[0]
    for p in preds_spark[1:]:
        cond = cond & p
    aggs = [
        pround(F.sum(agg), 2).alias("s"),
        pround(F.avg(agg), 4).alias("a"),
        pround(F.min(agg), 4).alias("mn"),
        pround(F.max(agg), 4).alias("mx"),
        F.count("*").alias("n"),
    ]
    filtered = li.filter(cond)
    sdf = filtered.groupBy(group).agg(*aggs) if group else filtered.agg(*aggs)
    spark_rows = {
        tuple(r): None for r in sdf.collect()
    }

    where = " AND ".join(preds_sql)
    sel_group = f"{group}, " if group else ""
    by = f"GROUP BY {group}" if group else ""
    sql = f"""
    SELECT {sel_group}
           FLOOR(SUM({agg}) * 100.0 + 0.5) / 100.0 AS s,
           FLOOR(AVG({agg}) * 10000.0 + 0.5) / 10000.0 AS a,
           FLOOR(MIN({agg}) * 10000.0 + 0.5) / 10000.0 AS mn,
           FLOOR(MAX({agg}) * 10000.0 + 0.5) / 10000.0 AS mx,
           COUNT(*) AS n
    FROM read_parquet('{SF_DIR}/lineitem.parquet')
    WHERE {where} {by}
    """
    duck_rows = {tuple(r): None for r in duckdb.connect().execute(sql).fetchall()}
    assert spark_rows == duck_rows, (preds_sql, group, agg)


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_join_agg_matches_duckdb(spark, seed):
    """Seeded-random join+aggregate shapes: lineitem⋈orders with random
    predicates on both sides."""
    rng = random.Random(2000 + seed)
    preds_spark, preds_sql, group, agg = _gen_case(rng)
    o_lo = rng.randint(0, 40000)
    status = rng.choice(["F", "O", "P"])

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        (F.col("o_totalprice") >= o_lo) & (F.col("o_orderstatus") == status)
    )
    cond = preds_spark[0]
    for p in preds_spark[1:]:
        cond = cond & p
    joined = li.filter(cond).join(o, li.l_orderkey == o.o_orderkey)
    aggs = [
        pround(F.sum(agg), 2).alias("s"),
        pround(F.sum("o_totalprice"), 2).alias("so"),
        F.count("*").alias("n"),
    ]
    sdf = joined.groupBy(group).agg(*aggs) if group else joined.agg(*aggs)
    spark_rows = {tuple(r): None for r in sdf.collect()}

    where = " AND ".join(preds_sql)
    sel_group = f"{group}, " if group else ""
    by = f"GROUP BY {group}" if group else ""
    sql = f"""
    SELECT {sel_group}
           FLOOR(SUM({agg}) * 100.0 + 0.5) / 100.0 AS s,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS so,
           COUNT(*) AS n
    FROM read_parquet('{SF_DIR}/lineitem.parquet') li
    JOIN read_parquet('{SF_DIR}/orders.parquet') o ON li.l_orderkey = o.o_orderkey
    WHERE {where} AND o_totalprice >= {o_lo} AND o_orderstatus = '{status}'
    {by}
    """
    duck_rows = {tuple(r): None for r in duckdb.connect().execute(sql).fetchall()}
    assert spark_rows == duck_rows, (preds_sql, o_lo, status, group, agg)


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_window_matches_duckdb(spark, seed):
    """Seeded-random window shapes: random partition key, random total
    order (a permutation of all key columns — (orderkey, linenumber) is
    unique, so any permutation is a total order), random function among
    ranks / lag / lead / running sum. Exact row-set comparison.
    running_sum uses l_quantity (integral-valued doubles -> exact
    sequential sums on both engines)."""
    from pyspark.sql import Window

    rng = random.Random(3000 + seed)
    part = rng.choice(CAT_COLS)
    order_cols = rng.sample(KEY_COLS, len(KEY_COLS))
    func = rng.choice(
        ["row_number", "rank", "dense_rank", "lag", "lead", "running_sum"]
    )
    val_col = rng.choice(NUMERIC_COLS)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_orderkey") <= 600
    )
    w = Window.partitionBy(part).orderBy(*[F.col(c).asc() for c in order_cols])
    if func == "row_number":
        expr, sql_fn = F.row_number().over(w), "ROW_NUMBER()"
    elif func == "rank":
        expr, sql_fn = F.rank().over(w), "RANK()"
    elif func == "dense_rank":
        expr, sql_fn = F.dense_rank().over(w), "DENSE_RANK()"
    elif func == "lag":
        expr, sql_fn = F.lag(val_col, 1).over(w), f"LAG({val_col}, 1)"
    elif func == "lead":
        expr, sql_fn = F.lead(val_col, 1).over(w), f"LEAD({val_col}, 1)"
    else:
        expr = (
            F.sum("l_quantity")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        sql_fn = "SUM(l_quantity)"

    sdf = li.select("l_orderkey", "l_linenumber", expr.alias("v"))
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    order_sql = ", ".join(f"{c} ASC NULLS FIRST" for c in order_cols)
    frame = (
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if func == "running_sum"
        else ""
    )
    sql = f"""
    SELECT l_orderkey, l_linenumber,
           {sql_fn} OVER (PARTITION BY {part} ORDER BY {order_sql}{frame}) AS v
    FROM read_parquet('{SF_DIR}/lineitem.parquet')
    WHERE l_orderkey <= 600
    """
    duck_rows = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert spark_rows == duck_rows, (part, order_cols, func)


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_join_types_match_duckdb(seed, spark):
    """Seeded-random LEFT / LEFT SEMI / LEFT ANTI / FULL OUTER joins of
    orders against a filtered customer side — null-extension and
    existence semantics compared exactly against DuckDB."""
    rng = random.Random(4000 + seed)
    how, sql_join = rng.choice(
        [
            ("left", "LEFT JOIN"),
            ("left_semi", "SEMI JOIN"),
            ("left_anti", "ANTI JOIN"),
            ("full_outer", "FULL JOIN"),
        ]
    )
    seg = rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE"])
    bal_lo = rng.randint(-1000, 9000)
    key_cap = rng.randint(200, 1500)

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderkey") <= key_cap
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
        (F.col("c_mktsegment") == seg) & (F.col("c_acctbal") >= bal_lo)
    )
    j = o.join(c, o.o_custkey == c.c_custkey, how)
    cols = (
        ["o_orderkey", "o_custkey"]
        if how in ("left_semi", "left_anti")
        else ["o_orderkey", "o_custkey", "c_custkey", "c_acctbal"]
    )
    def nsafe(row):
        return tuple((v is not None, v if v is not None else 0) for v in row)

    spark_rows = sorted(
        (tuple(r) for r in j.select(*[F.col(c_) for c_ in cols]).collect()),
        key=nsafe,
    )

    proj = ", ".join(cols)
    sql = f"""
    SELECT {proj}
    FROM (SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')
          WHERE o_orderkey <= {key_cap}) o
    {sql_join} (SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')
                WHERE c_mktsegment = '{seg}' AND c_acctbal >= {bal_lo}) c
      ON o.o_custkey = c.c_custkey
    """
    duck_rows = sorted(
        (tuple(r) for r in duckdb.connect().execute(sql).fetchall()), key=nsafe
    )
    assert spark_rows == duck_rows, (how, seg, bal_lo, key_cap)


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_set_ops_match_duckdb(seed, spark):
    """Seeded-random UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] over
    projections with engineered duplicate multiplicities (modular
    projection of order keys) — multiset vs set semantics compared
    exactly against DuckDB."""
    rng = random.Random(5000 + seed)
    op, spark_op = rng.choice(
        [
            ("UNION", "union_set"),
            ("UNION ALL", "union_all"),
            ("INTERSECT", "intersect"),
            ("INTERSECT ALL", "intersect_all"),
            ("EXCEPT", "except_set"),
            ("EXCEPT ALL", "except_all"),
        ]
    )
    mod_a, mod_b = rng.randint(3, 9), rng.randint(3, 9)
    cap_a, cap_b = rng.randint(100, 500), rng.randint(100, 500)

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    a = o.filter(F.col("o_orderkey") <= cap_a).select(
        (F.col("o_orderkey") % mod_a).alias("k"), "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") <= cap_b).select(
        (F.col("o_orderkey") % mod_b).alias("k"), "o_orderpriority"
    )
    if spark_op == "union_set":
        j = a.union(b).distinct()
    elif spark_op == "union_all":
        j = a.union(b)
    elif spark_op == "intersect":
        j = a.intersect(b)
    elif spark_op == "intersect_all":
        j = a.intersectAll(b)
    elif spark_op == "except_set":
        j = a.subtract(b)  # SQL EXCEPT = set semantics
    else:
        j = a.exceptAll(b)
    spark_rows = sorted(tuple(r) for r in j.collect())

    base = f"read_parquet('{SF_DIR}/orders.parquet')"
    sql = f"""
    SELECT o_orderkey % {mod_a} AS k, o_orderpriority FROM {base}
    WHERE o_orderkey <= {cap_a}
    {op}
    SELECT o_orderkey % {mod_b} AS k, o_orderpriority FROM {base}
    WHERE o_orderkey <= {cap_b}
    """
    duck_rows = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert spark_rows == duck_rows, (op, mod_a, mod_b, cap_a, cap_b)
