from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import relational
from data_engineering_capstone_project__spark.operators.relational import (
    add_row_id,
    linkage_join,
    rename_columns,
    top_k_per_group,
)
from data_engineering_capstone_project__spark.plans.qa import qa_compare, qa_diff


def test_add_row_id_matches_global_row_number(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = add_row_id(orders, ["o_orderkey"], num_partitions=8)
    got = {r["o_orderkey"]: r["row_num"] for r in out.select("o_orderkey", "row_num").collect()}
    keys = sorted(got)
    assert [got[k] for k in keys] == list(range(1, len(keys) + 1))
    assert out.count() == orders.count()


def test_add_row_id_multicol_matches_global_row_number(spark, sf_dir):
    """Multi-column (string, string-with-nulls) keys through the encoded
    expression fast path must produce the same ids as a naive global
    ROW_NUMBER over the same total order (asc_nulls_first)."""
    from pyspark.sql import Window

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "seg_n", F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_mktsegment"))
    )
    out = add_row_id(c, ["seg_n", "c_name"], id_col="rid", num_partitions=8)
    got = {r["c_custkey"]: r["rid"] for r in out.collect()}
    w = Window.orderBy(F.col("seg_n").asc_nulls_first(), F.col("c_name").asc_nulls_first())
    want = {
        r["c_custkey"]: r["rid"]
        for r in c.withColumn("rid", F.row_number().over(w)).collect()
    }
    assert got == want


def test_rename_columns_exact_mode(spark):
    df = spark.createDataFrame([(1, "a", "x")], "row_num long, raw1 string, junk string")
    out = rename_columns(df, {"raw1": "clean1", "row_num": "row_num"}, keep_unmapped=False)
    assert out.columns == ["clean1", "row_num"]


def test_linkage_join_padded_keys(spark):
    left = spark.createDataFrame(
        [("s1", "2017-10", "42"), ("s2", "2017-10", "123456")],
        "`school name` string, `claim date` string, `district id` string",
    )
    right = spark.createDataFrame(
        [("s1", "2017-10", "000042", "L"), ("s2", "2017-10", "123456", "M"),
         ("s3", "2017-10", "7", "N")],
        "sname string, cdate string, did string, extra string",
    )
    out = linkage_join(
        left, right,
        exact_keys=[("school name", "sname"), ("claim date", "cdate")],
        padded_keys=[("district id", "did")],
    )
    rows = {(r["school name"], r["extra"]) for r in out.collect()}
    assert rows == {("s1", "L"), ("s2", "M")}


def test_qa_compare_reference_example(spark):
    """The reference's own QA literal tables (:1097-1113): counts 5,5,4."""
    t1 = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("A", "D"), ("B", "D"), ("B", "F")],
        "field1 string, field2 string",
    )
    t2 = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("A", "D"), ("B", "D"), ("E", "F")],
        "field1 string, field2 string",
    )
    row = qa_compare(t1, t2).collect()[0]
    assert (row["count_a"], row["count_b"], row["count_common"]) == (5, 5, 4)
    assert not row["equivalent"]
    diff = qa_diff(t1, t2)
    assert diff.count() == 2


def test_top_k_per_group(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = top_k_per_group(
        li, ["l_returnflag"], [F.col("l_extendedprice").desc()], k=3
    )
    counts = out.groupBy("l_returnflag").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_top_k_two_phase_matches_single_phase(spark, sf_dir):
    # Given a total order, the partition-pruned plan must return the
    # exact same rows as the naive single-window plan.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(8)
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    keys = ["l_returnflag", "l_orderkey", "l_linenumber", "rn"]
    fast = top_k_per_group(li, ["l_returnflag"], order, k=5)
    naive = top_k_per_group(li, ["l_returnflag"], order, k=5, two_phase=False)
    a = sorted(tuple(r) for r in fast.select(*keys).collect())
    b = sorted(tuple(r) for r in naive.select(*keys).collect())
    assert a == b and len(a) > 0


def test_skew_profile_salt_factor(spark):
    df = spark.createDataFrame(
        [("hot",)] * 90 + [("warm",)] * 8 + [("cold",)] * 2, "k string"
    )
    rows = relational.skew_profile(df, ["k"], top_n=3).collect()
    assert [r["k"] for r in rows] == ["hot", "warm", "cold"]
    hot = rows[0]
    assert hot["n"] == 90 and abs(hot["share"] - 0.9) < 1e-9
    # mean key size is 100/3; hot is 2.7x the mean -> salt 3 levels it
    assert hot["salt_factor"] == 3
    assert rows[2]["salt_factor"] == 1


def test_weighted_sample_matches_python_reference(spark):
    """A-ES priorities and the winning row set equal a row-at-a-time
    reference using the same md5-derived uniform (bit-exact doubles)."""
    import hashlib
    import math

    from data_engineering_capstone_project__spark.operators.relational import (
        weighted_sample_by_hash,
    )

    rows = [(i, float(1 + (i * 7) % 23)) for i in range(200)]
    rows += [(900, 0.0), (901, -2.0), (902, None)]  # excluded
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r["doc_id"]: r["p"]
        for r in weighted_sample_by_hash(
            df, "w", k=25, salt="t", priority_col="p"
        ).collect()
    }

    def pri(i, w):
        v = int(hashlib.md5(f"{i}|t".encode()).hexdigest()[:13], 16)
        return -math.log((v + 0.5) / float(1 << 52)) / w

    want = sorted(((pri(i, w), i) for i, w in rows[:200]), key=lambda t: t)[:25]
    assert got == {i: p for p, i in want}
    # layout independence: same sample from any partitioning
    got2 = {
        r["doc_id"]
        for r in weighted_sample_by_hash(
            df.repartition(13), "w", k=25, salt="t"
        ).collect()
    }
    assert got2 == set(got)


def test_weighted_sample_biases_toward_weight(spark):
    """Heavy rows (w=10) dominate a k=100 sample over light rows (w=1)
    at 500/500 — a deterministic statistical property of the fixed salt."""
    from data_engineering_capstone_project__spark.operators.relational import (
        weighted_sample_by_hash,
    )

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = sum(
        1
        for r in weighted_sample_by_hash(df, "w", k=100, salt="bias").collect()
        if r["doc_id"] < 500
    )
    assert heavy >= 70, heavy


def test_weighted_sample_plans_as_take_ordered(spark):
    """The global top-k must plan as TakeOrderedAndProject (k-bounded
    partial top-k + merge), never a full global Sort."""
    from data_engineering_capstone_project__spark.operators.relational import (
        weighted_sample_by_hash,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = weighted_sample_by_hash(df, "w", k=50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_sketch_profile_bounds(spark, sf_dir):
    """HLL estimate within its 3-sigma error model; GK percentile ranks
    within the 1/accuracy guarantee; one-row bounded-state output."""
    from data_engineering_capstone_project__spark.operators.relational import (
        sketch_profile,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = sketch_profile(
        o, "o_custkey", "o_totalprice", rsd=0.05, percentiles=(0.25, 0.5, 0.9)
    ).collect()
    assert len(row) == 1
    prof = row[0]
    exact = o.select("o_custkey").distinct().count()
    assert abs(prof["approx_distinct"] - exact) <= max(3 * 0.05 * exact, 1)
    n = prof["n_rows"]
    vals = sorted(r["o_totalprice"] for r in o.select("o_totalprice").collect())
    for target, est in zip((0.25, 0.5, 0.9), prof["approx_ps"]):
        lt = sum(1 for v in vals if v < est)
        le = sum(1 for v in vals if v <= est)
        tol = 1.0 / 10000 + 1.0 / n
        assert lt / n - tol <= target <= le / n + tol, (target, est)
    assert list(prof["approx_ps"]) == sorted(prof["approx_ps"])


def test_weighted_sample_per_group_semantics(spark):
    """Per-group A-ES: each group yields its own k winners, identical to
    running the global sampler on that group alone; group sizes under k
    return the whole group."""
    from data_engineering_capstone_project__spark.operators.relational import (
        weighted_sample_by_hash,
        weighted_sample_per_group,
    )

    rows = [(i, "g%d" % (i % 3), float(1 + i % 5)) for i in range(90)]
    rows += [(500, "tiny", 2.0), (501, "tiny", 3.0)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample_per_group(
        df, ["grp"], "w", k=7, salt="pg"
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
    assert by_grp["tiny"] == {500, 501}  # under k: whole group
    for g in ("g0", "g1", "g2"):
        assert len(by_grp[g]) == 7
        solo = {
            r["doc_id"]
            for r in weighted_sample_by_hash(
                df.filter(F.col("grp") == g), "w", k=7, salt="pg"
            ).collect()
        }
        assert by_grp[g] == solo, g


# --------------------------------------------- Misra-Gries frequent items


def test_frequent_items_exact_regime(spark):
    """k >= distinct values: the sketch IS the exact groupBy count."""
    from data_engineering_capstone_project__spark.operators.relational import (
        frequent_items_sketch,
    )

    df = spark.createDataFrame(
        [(v,) for v in ["a"] * 7 + ["b"] * 5 + ["c"] * 3 + [None] * 2],
        "x string",
    ).repartition(3)
    out = frequent_items_sketch(df, "x", k=10).collect()
    got = {r["item"]: r["est_count"] for r in out}
    assert got == {"a": 7, "b": 5, "c": 3}
    assert all(r["err_bound"] == 0 and r["n_rows"] == 15 for r in out)


def test_frequent_items_decrement_regime_guarantees(spark):
    """k < distinct values, adversarially interleaved input: the MG
    guarantees hold — est <= true <= est + err, err <= N/(k+1), and
    every item with true count > err is present (the heavy hitter
    cannot be evicted)."""
    from data_engineering_capstone_project__spark.operators.relational import (
        frequent_items_sketch,
    )

    # 30 x 'hot', 25 x 'warm', 15 x 'cold', interleaved so counters
    # churn; single partition makes the decrement path deterministic
    vals = (["hot", "warm", "cold"] * 15) + (["hot", "warm"] * 10) + ["hot"] * 5
    true = {"hot": 30, "warm": 25, "cold": 15}
    n = len(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x string").coalesce(1)
    rows = frequent_items_sketch(df, "x", k=2).collect()
    assert rows, "sketch must emit survivors"
    err = rows[0]["err_bound"]
    assert 0 < err <= n // 3  # decrements happened; bound N/(k+1)
    for r in rows:
        t = true[r["item"]]
        assert r["est_count"] <= t <= r["est_count"] + err
    present = {r["item"] for r in rows}
    for item, t in true.items():
        if t > err:
            assert item in present
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be >= 1"):
        frequent_items_sketch(df, "x", k=0)
