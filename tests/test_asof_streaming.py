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


def test_asof_enrich_stream_batch_boundary_invariant(spark, sf_dir, tmp_path):
    """Stream-static as-of enrichment (VERDICT r10 #5): events split
    over THREE micro-batches (maxFilesPerTrigger=1) enrich against a
    static feature table identically to one batch asof_join over the
    same arrivals — per-row semantics make micro-batch boundaries
    invisible."""
    from data_engineering_capstone_project__spark.operators.asof import asof_join
    from data_engineering_capstone_project__spark.streaming.stream import (
        asof_enrich_stream,
    )

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    features = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts", F.col("value").alias("sv"))
    )
    src = str(tmp_path / "ev_files")
    # three files -> three micro-batches
    ev.withColumn("_b", F.pmod(F.xxhash64("event_id"), F.lit(3))).write.partitionBy(
        "_b"
    ).parquet(src)
    arrivals = spark.read.parquet(src).select("event_id", "user_id", "ts")
    stream = (
        spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/_b=*")
    )
    got = asof_enrich_stream(
        stream, features, ts_col="ts", by=["user_id"], right_value_cols=["sv"]
    )
    want = asof_join(
        arrivals, features, ts_col="ts", by=["user_id"], right_value_cols=["sv"]
    )
    assert got.count() == arrivals.count()
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_stream_stateful_counts(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_stream_to_table(stateful_running_count(stream), mode="update")
    ev = load_events(spark, sf_dir)
    expect = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    final = {r["user_id"]: r["n_events"] for r in got.collect()}
    assert final == expect


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 5-min watermark: an event arriving
    after its window was finalized must be dropped, not re-counted."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    src = str(tmp_path / "wm_src")
    os.makedirs(src)

    def write_file(name, ts_list):
        tbl = pa.table({
            "ts": pa.array([datetime(2024, 1, 1, 10, m, s) for m, s in ts_list],
                           type=pa.timestamp("us")),
            "k": pa.array(["u"] * len(ts_list)),
        })
        pq.write_table(tbl, os.path.join(src, name))

    # batch 1: two events in [10:00,10:10)
    write_file("f1.parquet", [(0, 30), (1, 0)])
    _time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: pushes max event time to 10:16 -> watermark 10:11 after it
    write_file("f2.parquet", [(16, 0)])
    _time.sleep(1.1)
    # batch 3: runs with watermark 10:11 > window end 10:10 -> the 10:00
    # window is emitted (count 2) and its state evicted
    write_file("f3.parquet", [(17, 0)])
    _time.sleep(1.1)
    # batch 4: a LATE event for the already-emitted 10:00 window + a fresh
    # one; the late event must not resurrect the window
    write_file("f4.parquet", [(1, 30), (22, 0)])

    from pyspark.sql import functions as F
    from data_engineering_capstone_project__spark.streaming.stream import (
        run_stream_to_table,
    )

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )
    rows = {
        r["start"]: r["n"] for r in run_stream_to_table(agg, mode="append").collect()
    }
    # only the finalized 10:00 window is emitted, and the late event did
    # NOT inflate it from 2 to 3
    assert rows == {"2024-01-01 10:00:00": 2}


def test_stream_incremental_upsert(spark, tmp_path):
    """foreachBatch incremental MERGE: per-batch upserts converge to the
    batch groupBy result."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_capstone_project__spark.streaming.stream import (
        run_stream_incremental_upsert,
    )

    src = str(tmp_path / "inc_src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([10, 20], type=pa.int64())}),
        os.path.join(src, "a.parquet"),
    )
    import time as _time
    _time.sleep(1.1)
    pq.write_table(
        pa.table({"k": pa.array([2, 3], type=pa.int64()),
                  "v": pa.array([25, 30], type=pa.int64())}),
        os.path.join(src, "b.parquet"),
    )
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    target = str(tmp_path / "inc_target")
    run_stream_incremental_upsert(stream, target, keys=["k"])
    final = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert final == {1: 10, 2: 25, 3: 30}  # later batch wins on key 2


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates inside the watermark horizon are
    dropped (state-bounded dropDuplicatesWithinWatermark); distinct key
    set matches the batch dedup of the same files."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    src = str(tmp_path / "dd_src")
    os.makedirs(src)

    def write_file(name, rows):
        tbl = pa.table({
            "ts": pa.array([datetime(2024, 1, 1, 10, m, s) for m, s, _ in rows],
                           type=pa.timestamp("us")),
            "k": pa.array([k for _, _, k in rows]),
        })
        pq.write_table(tbl, os.path.join(src, name))

    write_file("f1.parquet", [(0, 0, "a"), (0, 30, "a"), (1, 0, "b")])
    _time.sleep(1.1)
    write_file("f2.parquet", [(2, 0, "a"), (2, 30, "c"), (3, 0, "b")])

    from data_engineering_capstone_project__spark.streaming.stream import (
        dedup_stream,
        run_stream_to_table,
    )

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_stream_to_table(
        dedup_stream(stream, ["k"], watermark="1 hour"), mode="append"
    ).collect()
    keys = sorted(r["k"] for r in out)
    assert keys == ["a", "b", "c"]  # one survivor per key, 6 inputs -> 3


def test_sessionize_stream_matches_batch(spark, sf_dir):
    """Native session_window streaming sessions == batch lag-based
    sessionize: same session count and same per-user totals."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.sources.io import load_events
    from data_engineering_capstone_project__spark.streaming.stream import (
        run_stream_to_table,
        sessionize_stream,
        stream_events,
    )
    from data_engineering_capstone_project__spark.streaming.windows import sessionize

    ev_stream = stream_events(spark, sf_dir)
    got = run_stream_to_table(
        sessionize_stream(ev_stream, gap="30 minutes"), mode="complete"
    )
    batch = sessionize(load_events(spark, sf_dir), "ts", "user_id", gap="30 minutes")
    batch_sessions = batch.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    assert got.count() == batch_sessions.count()
    a = sorted((r["user_id"], r["n_events"]) for r in got.collect())
    b = sorted((r["user_id"], r["n_events"]) for r in batch_sessions.collect())
    assert a == b


def test_decontaminate_stream_routes_by_fingerprint(spark, tmp_path):
    """Stream-static decontamination: clean docs pass, corpus-known docs
    (by exact normalized fingerprint, any id) drop; keep='contaminated'
    is the complement; bad keep raises."""
    import pytest
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.streaming.stream import (
        corpus_fingerprint_index,
        decontaminate_stream,
        run_stream_to_table,
    )

    corpus = spark.createDataFrame(
        [(1, "known document alpha"), (2, "Known   DOCUMENT alpha"),  # same fp
         (3, "another known text")],
        "doc_id long, text string",
    )
    idx = corpus_fingerprint_index(corpus)
    assert idx.count() == 2  # rows 1-2 collapse to one fingerprint
    incoming = spark.createDataFrame(
        [(10, "fresh never seen content"),
         (11, "KNOWN document    ALPHA"),       # normalizes into the index
         (12, "another known text"),
         (13, "also new material here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "stream_src")
    incoming.write.parquet(src)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    clean = run_stream_to_table(
        decontaminate_stream(stream, idx), mode="append"
    )
    assert {r["doc_id"] for r in clean.collect()} == {10, 13}
    assert set(clean.columns) == {"doc_id", "text"}  # helper cols dropped
    stream2 = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    dirty = run_stream_to_table(
        decontaminate_stream(stream2, idx, keep="contaminated"), mode="append"
    )
    assert {r["doc_id"] for r in dirty.collect()} == {11, 12}
    with pytest.raises(ValueError):
        decontaminate_stream(stream, idx, keep="nope")


@pytest.mark.slow
def test_asof_join_hot_key_path_row_identical(spark):
    """Skew-safe as-of (VERDICT r9 #3): a planted 90%-one-key distribution
    routed through the bucketed two-phase plan returns ROW-IDENTICAL
    results to the plain single-window plan, in both directions, including
    per-column ignorenulls semantics (right rows with nulls in one value
    column) AND null timestamps on BOTH sides (ADVICE r10: null ts must
    land in bucket 0 — the plain plan's nulls-first sort position — not
    the last bucket)."""
    import random

    rnd = random.Random(7)
    # hot key 'H' carries 90% of rows; two cold keys share the rest
    left_rows, right_rows = [], []
    rid = 0
    for i in range(2000):
        k = "H" if i % 10 else ("c1" if i % 20 else "c2")
        # ~7% null left ts: matches nothing backward, first value forward
        t = None if i % 13 == 0 else rnd.randint(0, 10_000)
        left_rows.append((k, t, i))
    for i in range(1500):
        k = "H" if i % 10 else ("c1" if i % 20 else "c2")
        # ~9% null right ts: sorts first (ts=-inf-like) in the plain plan
        t = None if i % 11 == 0 else rnd.randint(0, 10_000)
        # plant per-column nulls: v1 null on thirds, v2 null on fifths
        v1 = None if i % 3 == 0 else rnd.randint(0, 99)
        v2 = None if i % 5 == 0 else float(rnd.randint(0, 99))
        right_rows.append((k, t, v1, v2))
        rid += 1
    left = spark.createDataFrame(left_rows, "k string, t bigint, id bigint")
    right = spark.createDataFrame(
        right_rows, "k string, t bigint, v1 bigint, v2 double"
    )
    for direction in ("backward", "forward"):
        plain = asof_join(left, right, "t", ["k"], direction=direction)
        hot = asof_join(
            left, right, "t", ["k"], direction=direction,
            hot_key_threshold=500, n_time_buckets=16,
        )
        assert hot.exceptAll(plain).isEmpty()
        assert plain.exceptAll(hot).isEmpty()
        assert hot.count() == left.count()


def test_asof_join_hot_key_bounded_sort_groups(spark):
    """No task sorts the hot key's full history: the hot path's window
    partitions by (key, bucket), and the largest (key, bucket) group is a
    small fraction of the hot key's rows (the plain plan's single group
    IS the full history). Also asserts the physical plan's window
    partition spec actually carries the bucket column."""
    import random

    from data_engineering_capstone_project__spark.plans.inspect import (
        physical_plan,
    )

    rnd = random.Random(11)
    n = 5000
    left = spark.createDataFrame(
        [("H" if i % 10 else "c", rnd.randint(0, 100_000), i) for i in range(n)],
        "k string, t bigint, id bigint",
    )
    right = spark.createDataFrame(
        [("H" if i % 10 else "c", rnd.randint(0, 100_000), i) for i in range(n)],
        "k string, t bigint, v bigint",
    )
    out = asof_join(
        left, right, "t", ["k"], hot_key_threshold=1000, n_time_buckets=64
    )
    plan = physical_plan(out)
    assert "_abkt" in plan  # bucketed window really in the executed plan
    # ground truth on the sort-group sizes the hot window would see
    unioned_size = 2 * n * 9 // 10  # hot key's union rows ~ 9000
    groups = (
        left.unionByName(
            right.withColumnRenamed("v", "id"), allowMissingColumns=True
        )
        .filter(F.col("k") == "H")
        .withColumn(
            "_b",
            F.least(
                F.lit(63), F.floor(F.col("t").cast("double") * 64 / 100_000)
            ),
        )
        .groupBy("_b")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert groups < unioned_size / 16  # no group near the full history
    # and the result still matches the plain plan
    plain = asof_join(left, right, "t", ["k"])
    assert out.exceptAll(plain).isEmpty() and plain.exceptAll(out).isEmpty()
