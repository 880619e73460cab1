"""Sharded ingest (VERDICT r11 #2): content-routed independent shard
roots — concurrent ticks ≡ serialized, exact dedup global via routing,
per-shard lease independence, lifecycle (recovery/compaction) inherited
per shard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.plans import ingest, shards


def _dig(df):
    r = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("doc_id", "text")).alias("x"),
    ).first()
    return (r["n"], r["x"])


def test_concurrent_ticks_equal_serialized_golden(spark, sf_dir, tmp_path):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 200)
    b1 = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    root = str(tmp_path / "r")
    golden = str(tmp_path / "g")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
    shards.init_sharded_ingest(spark, corpus, golden, n_shards=2)
    sc = shards.ingest_batch_sharded(spark, b1, root)
    ss = shards.ingest_batch_sharded(spark, b1, golden, max_parallel=1)
    assert sorted(sc) == sorted(ss) == [0, 1]
    assert {s: st.n_published for s, st in sc.items()} == {
        s: st.n_published for s, st in ss.items()
    }
    assert _dig(shards.read_sharded_corpus(spark, root)) == _dig(
        shards.read_sharded_corpus(spark, golden)
    )


def test_content_routing_makes_exact_dedup_global(spark, sf_dir, tmp_path):
    """A byte-identical doc under a FRESH id routes to its original's
    shard (routing hashes the exact-dedup fingerprint, never the id)
    and drops there — zero published across all shards, no shared
    index consulted."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 300)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=4)
    renamed = corpus.select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        *[c for c in corpus.columns if c != "doc_id"],
    )
    stats = shards.ingest_batch_sharded(spark, renamed, root)
    assert stats and all(s.n_published == 0 for s in stats.values())
    assert _dig(shards.read_sharded_corpus(spark, root)) == _dig(corpus)


def test_shard_lease_independence(spark, sf_dir, tmp_path):
    """The throughput claim mechanically: a tick touching only shard 0
    proceeds while shard 1's lease is HELD by another writer — the
    single-root design would serialize these."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 200)
    batch = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
    b0 = batch.filter(shards.shard_route(F.col("text"), 2) == 0)
    assert b0.count() > 0
    gen = ingest.acquire_ingest_lease(shards.shard_root(root, 1))
    try:
        stats = shards.ingest_batch_sharded(spark, b0, root)
        assert list(stats) == [0]
    finally:
        ingest.release_ingest_lease(shards.shard_root(root, 1), gen)
    # and a tick ROUTED to the held shard raises the single-writer error
    b1 = batch.filter(shards.shard_route(F.col("text"), 2) == 1)
    gen = ingest.acquire_ingest_lease(shards.shard_root(root, 1))
    try:
        with pytest.raises(ingest.ConcurrentIngestError):
            shards.ingest_batch_sharded(spark, b1, root)
    finally:
        ingest.release_ingest_lease(shards.shard_root(root, 1), gen)


def test_sharded_lifecycle_replay_and_compaction(spark, sf_dir, tmp_path):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 200)
    b1 = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350))
    b2 = d.filter(F.col("doc_id") >= 350)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
    shards.ingest_batch_sharded(spark, b1, root)
    shards.ingest_batch_sharded(spark, b2, root)
    want = _dig(shards.read_sharded_corpus(spark, root))
    # replay of both batches is exactly-once per shard
    for b in (b1, b2):
        stats = shards.ingest_batch_sharded(spark, b, root)
        assert all(s.n_published == 0 for s in stats.values())
    assert _dig(shards.read_sharded_corpus(spark, root)) == want
    vs = shards.compact_sharded_ingest(spark, root)
    assert sorted(vs) == [0, 1]
    assert _dig(shards.read_sharded_corpus(spark, root)) == want
    # the loop keeps deduping post-compaction
    stats = shards.ingest_batch_sharded(spark, b1, root)
    assert all(s.n_published == 0 for s in stats.values())


def test_shard_config_pinned_and_required(spark, sf_dir, tmp_path):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 100)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
    with pytest.raises(FileExistsError, match="immutable"):
        shards.init_sharded_ingest(spark, corpus, root, n_shards=3)
    with pytest.raises(FileNotFoundError, match="not a sharded"):
        shards.read_sharded_corpus(spark, str(tmp_path / "nope"))
    cfg = shards.load_shard_config(root)
    assert cfg["n_shards"] == 2 and cfg["id_col"] == "doc_id"
    # routing spreads the corpus across both shards on this data
    per = {
        s: ingest.read_ingest_corpus(
            spark, shards.shard_root(root, s)
        ).count()
        for s in range(2)
    }
    assert all(n > 0 for n in per.values())
    assert sum(per.values()) == corpus.count()


def test_sharded_global_bm25_search(spark, sf_dir, tmp_path):
    """Global search over a sharded corpus (r12 composition of the two
    headline features): per-shard posting logs probe as ONE index —
    summed scalars + cross-shard df_t — hash-equal to a from-scratch
    BM25 over the union publication log."""
    from data_engineering_capstone_project__spark.operators import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 300)
    b1 = d.filter(F.col("doc_id") >= 300)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, bm25_index=True
    )
    shards.ingest_batch_sharded(spark, b1, root)
    Q = {"q_scan": "hash scan filter", "q_stream": "stream window watermark"}
    got = sorted(
        map(
            tuple,
            text.bm25_topk_incremental(
                spark, shards.sharded_bm25_paths(root), Q, k=10
            ).collect(),
        )
    )
    union = shards.read_sharded_corpus(spark, root)
    ref = sorted(
        map(tuple, text.bm25_topk(union, Q, k=10, weights=None).collect())
    )
    assert got == ref
    # a root bootstrapped WITHOUT the posting logs refuses clearly
    root2 = str(tmp_path / "r2")
    shards.init_sharded_ingest(spark, corpus, root2, n_shards=2)
    with pytest.raises(FileNotFoundError, match="bm25_index=True"):
        shards.sharded_bm25_paths(root2)
