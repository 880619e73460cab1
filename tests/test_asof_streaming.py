from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators.asof import asof_join, range_join
from data_engineering_capstone_project__spark.operators.relational import (
    salted_group_count,
)
from data_engineering_capstone_project__spark.sources.io import load_events
from data_engineering_capstone_project__spark.streaming.stream import (
    run_stream_to_table,
    stateful_running_count,
    stream_events,
    windowed_stream_agg,
)


def test_asof_join_backward_and_forward(spark):
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 25.0), (3, "u", 5.0), (4, "v", 50.0)],
        "id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("u", 10.0, "a"), ("u", 20.0, "b"), ("v", 60.0, "c")],
        "k string, t double, val string",
    )
    back = {
        r["id"]: r["val_r"]
        for r in asof_join(left, right, ts_col="t", by=["k"]).collect()
    }
    # id=1 t=10: right at t=10 matches (<=); id=3 t=5: nothing before; id=4: v has only t=60
    assert back == {1: "a", 2: "b", 3: None, 4: None}
    fwd = {
        r["id"]: r["val_r"]
        for r in asof_join(left, right, ts_col="t", by=["k"], direction="forward").collect()
    }
    assert fwd == {1: "a", 2: None, 3: "a", 4: "c"}


def test_asof_join_tie_determinism(spark):
    """Several right rows at the SAME (by, ts): the match must be stable
    across runs and input partitionings (hash tiebreak, not heap order)."""
    left = spark.createDataFrame(
        [(1, "u", 15.0), (2, "u", 20.0)], "id long, k string, t double"
    )
    dup_rows = [("u", 10.0, f"v{i}") for i in range(8)] + [("u", 20.0, "w0"), ("u", 20.0, "w1")]
    right1 = spark.createDataFrame(dup_rows, "k string, t double, val string")
    right2 = spark.createDataFrame(
        list(reversed(dup_rows)), "k string, t double, val string"
    ).repartition(7)
    pick1 = {r["id"]: r["val_r"] for r in asof_join(left, right1, "t", ["k"]).collect()}
    pick2 = {r["id"]: r["val_r"] for r in asof_join(left, right2, "t", ["k"]).collect()}
    assert pick1 == pick2
    fwd1 = {
        r["id"]: r["val_r"]
        for r in asof_join(left, right1, "t", ["k"], direction="forward").collect()
    }
    fwd2 = {
        r["id"]: r["val_r"]
        for r in asof_join(left, right2, "t", ["k"], direction="forward").collect()
    }
    assert fwd1 == fwd2


def test_range_join_buckets(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 99.0)], "id long, x double")
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0)], "iv long, lo double, hi double"
    )
    out = {r["id"]: r["iv"] for r in range_join(pts, ivs, "x", "lo", "hi", 7.0).collect()}
    assert out == {1: 10, 2: 20}  # 99 matches nothing; bounds are [lo, hi)


def test_salted_count_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {r["l_suppkey"]: r["count"] for r in li.groupBy("l_suppkey").count().collect()}
    salted = {
        r["l_suppkey"]: r["cnt"]
        for r in salted_group_count(li, ["l_suppkey"], n_salts=8).collect()
    }
    assert salted == plain


def test_stream_tumbling_matches_batch(spark, sf_dir):
    from data_engineering_capstone_project__spark.streaming.windows import tumbling_agg

    stream = stream_events(spark, sf_dir)
    agg = windowed_stream_agg(
        stream, "ts", "10 minutes", ["event_type"], [F.count("*").alias("n")]
    )
    got = run_stream_to_table(agg, mode="complete")
    batch = tumbling_agg(
        load_events(spark, sf_dir), "ts", "10 minutes", ["event_type"],
        [F.count("*").alias("n")],
    )
    a = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert a == b


def test_stream_stateful_counts(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_stream_to_table(stateful_running_count(stream), mode="update")
    ev = load_events(spark, sf_dir)
    expect = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    final = {r["user_id"]: r["n_events"] for r in got.collect()}
    assert final == expect
