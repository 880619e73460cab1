"""Expression-level fuzzing vs DuckDB: string chains, date functions, and
numeric expression trees, generated pairwise (Spark Column + SQL text) from
one seeded RNG and compared per-row exactly.

Extends the query-shape fuzz (test_fuzz_oracle.py) down to the scalar
function surface — the place engine-parity bugs actually live (1-based
substring, pad truncation, datediff sign, dayofweek origin, NULL division,
IEEE rounding). Transcendentals (ln/exp/pow) are deliberately excluded:
libm implementations differ in ULPs across engines; everything used here
(+,-,*,/ with NULLIF, abs/floor/ceil/sqrt, greatest/least, CASE) is
IEEE-exact on both sides.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.functions.fx import pround

SF_DIR = "/root/testdata/sf0.001"


def _multiset(rows):
    out = {}
    for r in rows:
        t = tuple(r)
        out[t] = out.get(t, 0) + 1
    return out


# ---------------------------------------------------------------------------
# String chains over customer
# ---------------------------------------------------------------------------


def _string_step(rng: random.Random, col: Column, sql: str):
    kind = rng.choice(
        ["upper", "lower", "reverse", "substr", "lpad", "rpad", "replace",
         "concat", "repeat2"]
    )
    if kind == "upper":
        return F.upper(col), f"UPPER({sql})"
    if kind == "lower":
        return F.lower(col), f"LOWER({sql})"
    if kind == "reverse":
        return F.reverse(col), f"REVERSE({sql})"
    if kind == "substr":
        pos, ln = rng.randint(1, 6), rng.randint(2, 10)
        return F.substring(col, pos, ln), f"substr({sql}, {pos}, {ln})"
    if kind == "lpad":
        w = rng.randint(4, 24)
        return F.lpad(col, w, "*"), f"lpad({sql}, {w}, '*')"
    if kind == "rpad":
        w = rng.randint(4, 24)
        return F.rpad(col, w, "-"), f"rpad({sql}, {w}, '-')"
    if kind == "replace":
        a = rng.choice(["0", "1", "e", "r", "Customer"])
        b = rng.choice(["", "_", "X"])
        return F.replace(col, F.lit(a), F.lit(b)), f"replace({sql}, '{a}', '{b}')"
    if kind == "concat":
        sep = rng.choice(["-", "|", ""])
        return (
            F.concat_ws(sep, col, F.col("c_mktsegment")),
            f"concat_ws('{sep}', {sql}, c_mktsegment)",
        )
    return F.repeat(col, 2), f"repeat({sql}, 2)"


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_string_chains_match_duckdb(spark, seed):
    rng = random.Random(7000 + seed)
    base = rng.choice(["c_name", "c_mktsegment"])
    col, sql = F.col(base), base
    for _ in range(rng.randint(2, 4)):
        col, sql = _string_step(rng, col, sql)

    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    got = _multiset(c.select("c_custkey", col.alias("v")).collect())
    want = _multiset(
        duckdb.connect()
        .execute(
            f"SELECT c_custkey, {sql} AS v "
            f"FROM read_parquet('{SF_DIR}/customer.parquet')"
        )
        .fetchall()
    )
    assert got == want, sql


# ---------------------------------------------------------------------------
# Date functions over orders
# ---------------------------------------------------------------------------


def _date_op(rng: random.Random):
    d = "o_orderdate"
    kind = rng.choice(
        ["year", "month", "day", "trunc_m", "trunc_y", "last_day", "add",
         "diff", "dow", "doy"]
    )
    if kind == "year":
        return F.year(d).cast("long"), f"CAST(EXTRACT(YEAR FROM {d}) AS BIGINT)"
    if kind == "month":
        return F.month(d).cast("long"), f"CAST(EXTRACT(MONTH FROM {d}) AS BIGINT)"
    if kind == "day":
        return F.dayofmonth(d).cast("long"), f"CAST(EXTRACT(DAY FROM {d}) AS BIGINT)"
    if kind == "trunc_m":
        return F.trunc(d, "month"), f"CAST(date_trunc('month', {d}) AS DATE)"
    if kind == "trunc_y":
        return F.trunc(d, "year"), f"CAST(date_trunc('year', {d}) AS DATE)"
    if kind == "last_day":
        return F.last_day(d), f"last_day({d})"
    if kind == "add":
        n = rng.randint(-400, 400)
        return F.date_add(d, n), f"{d} + {n}"
    if kind == "diff":
        # Spark datediff(end, start) == DuckDB datediff('day', start, end)
        return (
            F.datediff(F.col(d), F.lit("1995-06-17").cast("date")).cast("long"),
            f"CAST(datediff('day', DATE '1995-06-17', {d}) AS BIGINT)",
        )
    if kind == "dow":
        # Spark dayofweek: 1=Sunday..7 ; DuckDB dayofweek: 0=Sunday..6
        return (
            (F.dayofweek(d) - 1).cast("long"),
            f"CAST(dayofweek({d}) AS BIGINT)",
        )
    return F.dayofyear(d).cast("long"), f"CAST(dayofyear({d}) AS BIGINT)"


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_date_functions_match_duckdb(spark, seed):
    rng = random.Random(8000 + seed)
    (c1, s1), (c2, s2) = _date_op(rng), _date_op(rng)

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = _multiset(
        o.select("o_orderkey", c1.alias("v1"), c2.alias("v2")).collect()
    )
    want = _multiset(
        duckdb.connect()
        .execute(
            f"SELECT o_orderkey, {s1} AS v1, {s2} AS v2 "
            f"FROM read_parquet('{SF_DIR}/orders.parquet')"
        )
        .fetchall()
    )
    assert got == want, (s1, s2)


# ---------------------------------------------------------------------------
# Numeric expression trees over lineitem
# ---------------------------------------------------------------------------

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _num_tree(rng: random.Random, depth: int):
    """Random IEEE-exact expression tree -> (Column, sql)."""
    if depth == 0:
        if rng.random() < 0.3:
            v = rng.randint(1, 9)
            return F.lit(float(v)), f"{v}.0"
        c = rng.choice(_NUM_COLS)
        return F.col(c).cast("double"), f"CAST({c} AS DOUBLE)"
    kind = rng.choice(
        ["add", "sub", "mul", "div", "abs", "floor", "ceil", "sqrt",
         "greatest", "least", "case"]
    )
    a, sa = _num_tree(rng, depth - 1)
    if kind in ("abs", "floor", "ceil", "sqrt"):
        if kind == "abs":
            return F.abs(a), f"ABS({sa})"
        if kind == "floor":
            return F.floor(a).cast("double"), f"CAST(FLOOR({sa}) AS DOUBLE)"
        if kind == "ceil":
            return F.ceil(a).cast("double"), f"CAST(CEIL({sa}) AS DOUBLE)"
        return F.sqrt(F.abs(a)), f"SQRT(ABS({sa}))"
    b, sb = _num_tree(rng, depth - 1)
    if kind == "add":
        return a + b, f"(({sa}) + ({sb}))"
    if kind == "sub":
        return a - b, f"(({sa}) - ({sb}))"
    if kind == "mul":
        return a * b, f"(({sa}) * ({sb}))"
    if kind == "div":
        return a / F.nullif(b, F.lit(0.0)), f"(({sa}) / NULLIF(({sb}), 0.0))"
    if kind == "greatest":
        return F.greatest(a, b), f"GREATEST({sa}, {sb})"
    if kind == "least":
        return F.least(a, b), f"LEAST({sa}, {sb})"
    return (
        F.when(a > b, a).otherwise(b),
        f"CASE WHEN ({sa}) > ({sb}) THEN ({sa}) ELSE ({sb}) END",
    )


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_numeric_trees_match_duckdb(spark, seed):
    rng = random.Random(9000 + seed)
    expr, sql = _num_tree(rng, rng.randint(2, 3))

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = _multiset(
        li.select(
            "l_orderkey", "l_linenumber", pround(expr, 4).alias("v")
        ).collect()
    )
    want = _multiset(
        duckdb.connect()
        .execute(
            f"SELECT l_orderkey, l_linenumber, "
            f"FLOOR(({sql}) * 10000.0 + 0.5) / 10000.0 AS v "
            f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        )
        .fetchall()
    )
    assert got == want, sql


# ---------------------------------------------------------------------------
# ROLLUP / CUBE grouping sets over lineitem
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_rollup_cube_match_duckdb(spark, seed):
    """Seeded rollup/cube shapes: subtotal rows, grouping flags, and
    parity-rounded aggregates must agree with DuckDB exactly."""
    rng = random.Random(11000 + seed)
    cols = rng.sample(["l_returnflag", "l_linestatus", "l_linenumber"], rng.randint(1, 2))
    agg_col = rng.choice(["l_quantity", "l_extendedprice"])
    mode = rng.choice(["rollup", "cube"])

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    grouped = li.rollup(*cols) if mode == "rollup" else li.cube(*cols)
    sdf = grouped.agg(
        pround(F.sum(agg_col), 2).alias("s"),
        F.count("*").alias("n"),
        *[F.grouping(c).cast("long").alias(f"g_{c}") for c in cols],
    )
    got = _multiset(sdf.collect())

    gsel = ", ".join(cols)
    gflags = ", ".join(f"CAST(GROUPING({c}) AS BIGINT) AS g_{c}" for c in cols)
    want = _multiset(
        duckdb.connect()
        .execute(
            f"SELECT {gsel}, FLOOR(SUM({agg_col}) * 100.0 + 0.5) / 100.0 AS s, "
            f"COUNT(*) AS n, {gflags} "
            f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
            f"GROUP BY {mode.upper()} ({gsel})"
        )
        .fetchall()
    )
    assert got == want, (mode, cols, agg_col)
