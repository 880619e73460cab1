"""Round-15 optimization regressions: the schema-cached parquet reader,
the memoized WindowGroupLimit probe, and the DSIR fit persist sharing —
each changes an operator's internals, so each gets a pinned behavior
test (optimization-round contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators.relational import (
    _window_group_limit_fires,
    top_k_per_group,
)
from data_engineering_capstone_project__spark.sources.io import (
    read_parquet_cached,
)


def test_schema_cached_read_matches_inferring_read(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 2).cast("int").alias("v")
    ).write.parquet(p)
    inferred = spark.read.parquet(p)
    first = read_parquet_cached(spark, p)   # fills the cache
    second = read_parquet_cached(spark, p)  # served from the cache
    assert second.schema == inferred.schema
    assert sorted(r["v"] for r in second.collect()) == sorted(
        r["v"] for r in inferred.collect()
    )
    assert first.schema == second.schema


def test_schema_cache_invalidated_by_overwrite(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(5).write.parquet(p)
    a = read_parquet_cached(spark, p)
    assert a.schema.fieldNames() == ["id"]
    # overwrite with a DIFFERENT schema: the directory is recreated, so
    # the (path, mtime, size) key changes and the cache must re-infer
    spark.range(5).select(
        F.col("id"), F.lit("x").alias("s")
    ).write.mode("overwrite").parquet(p)
    b = read_parquet_cached(spark, p)
    assert b.schema.fieldNames() == ["id", "s"]
    assert b.count() == 5


def test_schema_cached_read_multi_path(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).write.parquet(p1)
    spark.range(4).write.parquet(p2)
    u1 = read_parquet_cached(spark, p1, p2)
    u2 = read_parquet_cached(spark, p1, p2)
    assert u1.count() == 7 and u2.count() == 7
    assert u2.schema == u1.schema


def test_schema_cache_keys_on_inference_confs(spark, tmp_path):
    """A schema inferred under one parquet-reader conf must not be
    served to a session running another: the cache key carries the
    inference-affecting confs (the nanosAsLong/binaryAsString family)."""
    from data_engineering_capstone_project__spark.sources.io import (
        _SCHEMA_CACHE,
        _SCHEMA_CONFS,
    )

    p = str(tmp_path / "t.parquet")
    spark.range(4).write.parquet(p)
    conf = "spark.sql.legacy.parquet.nanosAsLong"
    assert conf in _SCHEMA_CONFS
    prev = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "false")
        a = read_parquet_cached(spark, p)
        n_after_first = len(
            [k for k in _SCHEMA_CACHE if k[0][0][0] == str(tmp_path / "t.parquet")]
        )
        spark.conf.set(conf, "true")
        b = read_parquet_cached(spark, p)
        n_after_second = len(
            [k for k in _SCHEMA_CACHE if k[0][0][0] == str(tmp_path / "t.parquet")]
        )
        # same file, different conf → a distinct cache entry (fresh
        # inference), never a cross-conf hit
        assert n_after_second == n_after_first + 1
        assert a.count() == b.count() == 4
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_wgl_synthetic_probe_matches_real_plan(spark, sf_dir):
    """The memoized synthetic probe must agree with the real physical
    plan on a representative top_k_per_group shape: when the probe says
    the native WindowGroupLimit rewrite fires, the executed plan of the
    operator's output must actually contain it (the map-side-prune
    guarantee the operator documents)."""
    li = read_parquet_cached(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    k = 3
    fires = _window_group_limit_fires(spark, k)
    out = top_k_per_group(
        li,
        ["l_returnflag"],
        [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        k=k,
        total_order=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert fires == ("WindowGroupLimit" in plan)
    if fires:
        # and the single-window form was kept (no explicit second phase)
        assert "__topk_pid" not in plan


def test_wgl_probe_respects_threshold_conf(spark):
    """k above the rule's threshold must NOT claim the native rewrite
    (the fallback two-phase shape takes over), and the memo must key on
    the conf value so a changed threshold is re-probed."""
    prev = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    try:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "5")
        assert not _window_group_limit_fires(spark, 1000)
        assert _window_group_limit_fires(spark, 3)
    finally:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", prev)


def test_topk_fallback_still_correct_over_threshold(spark):
    """With the native rewrite suppressed, top_k_per_group's explicit
    two-phase fallback must produce the identical row set."""
    rows = [(g, v) for g in ("a", "b") for v in range(20)]
    df = spark.createDataFrame(rows, "g string, v int")
    expected = {("a", 19, 1), ("a", 18, 2), ("b", 19, 1), ("b", 18, 2)}
    prev = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    try:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1")
        out = top_k_per_group(
            df, ["g"], [F.col("v").desc()], k=2, total_order=True
        )
        got = {(r["g"], r["v"], r["rn"]) for r in out.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", prev)


def test_dsir_fit_counts_persisted_once(spark):
    """dsir_fit persists its two bucket-count tables so the target
    corpus is featurized once: the ratio table must carry exactly
    n_buckets rows and identical values to a from-first-principles
    recomputation."""
    from data_engineering_capstone_project__spark.operators.text import (
        dsir_fit,
        hashed_ngram_buckets,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma") for i in range(30)],
        "doc_id bigint, text string",
    )
    raw = docs.filter(F.col("doc_id") >= 10)
    tgt = docs.filter(F.col("doc_id") < 10)
    nb = 64
    ratio = dsir_fit(raw, tgt, n_buckets=nb, alpha=1.0, salt="s")
    # the persist itself is the optimization: the physical plan must
    # consume the count tables through InMemoryTableScan (one target
    # featurization), not recompute them per branch
    plan = ratio._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    got = {r["bucket"]: r["_lr"] for r in ratio.collect()}
    assert len(got) == nb
    # recompute one populated bucket's ratio directly
    import math

    rg = hashed_ngram_buckets(raw, "doc_id", "text", nb, "s")
    tg = hashed_ngram_buckets(tgt, "doc_id", "text", nb, "s")
    rc = {r["bucket"]: r["c"] for r in rg.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    tc = {r["bucket"]: r["c"] for r in tg.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    tq, tt = sum(rc.values()), sum(tc.values())
    for b in list(rc)[:5]:
        want = math.log((tc.get(b, 0) + 1.0) / (tt + nb)) - math.log(
            (rc[b] + 1.0) / (tq + nb)
        )
        assert got[b] == pytest.approx(want, rel=0, abs=1e-12)
