"""Sharded ingest (VERDICT r11 #2): content-routed independent shard
roots — concurrent ticks ≡ serialized, exact dedup global via routing,
per-shard lease independence, lifecycle (recovery/compaction) inherited
per shard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.plans import ingest, shards

from _profile import prof


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_probe_all_shards_catches_cross_shard_near_dup(
    spark, sf_dir, tmp_path
):
    """`probe_all_shards=True`: a NEAR-dup (one word changed) of a doc
    published on shard X, arriving a tick later and routing to shard Y,
    drops against X's committed index; with the default shard-local
    probe the same document publishes — the documented trade, pinned
    from both sides."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 300).select("doc_id", "text")

    # a SPARSE-vocab source doc (the driver corpus's ~40-word vocab
    # band-collides everything with everything, which would drop the
    # near-dup even shard-locally and void the positive control)
    words = [f"uniqtok{i:03d}" for i in range(60)]
    src_text = " ".join(words)

    def route_of(text):
        return spark.createDataFrame([(text,)], "text string").select(
            shards.shard_route(F.col("text"), 2).alias("s")
        ).first()["s"]

    src_route = route_of(src_text)
    near = None
    for i in range(8, 40):
        cand = " ".join(words[:i] + ["zzzperturbzzz"] + words[i + 1:])
        if route_of(cand) != src_route:
            near = cand
            break
    assert near is not None

    for name, flag, expect_published in (("local", False, 1), ("global", True, 0)):
        root = str(tmp_path / name)
        shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
        # tick 1 publishes the source doc on its route's shard
        srcdf = spark.createDataFrame(
            [(88888, src_text)], "doc_id long, text string"
        )
        s0 = shards.ingest_batch_sharded(spark, srcdf, root)
        assert sum(s.n_published for s in s0.values()) == 1
        # tick 2: the near-dup routes to the OTHER shard
        nd = spark.createDataFrame([(99999, near)], "doc_id long, text string")
        stats = shards.ingest_batch_sharded(
            spark, nd, root, probe_all_shards=flag
        )
        assert sum(s.n_published for s in stats.values()) == expect_published, name


@pytest.mark.slow
def test_run_stream_ingest_sharded_matches_batch_ticks(
    spark, sf_dir, tmp_path
):
    """Streaming over shards: two micro-batches through
    run_stream_ingest_sharded publish the same union as the same two
    batches ticked sequentially — and cross-micro-batch duplicates are
    suppressed shard-locally exactly as in the batch loop."""
    import os as _os
    import shutil as _shutil

    from data_engineering_capstone_project__spark.plans.shards import (
        run_stream_ingest_sharded,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = d.filter(F.col("doc_id") < 200)
    a = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    b = d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))

    src = str(tmp_path / "src")
    _os.makedirs(src)
    for name, df, mtime in (("a", a, 1_000_000), ("b", b, 2_000_000)):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in _os.listdir(stage) if f.endswith(".parquet"))
        dst = _os.path.join(src, f"{name}.parquet")
        _shutil.move(_os.path.join(stage, part), dst)
        _shutil.rmtree(stage)
        _os.utime(dst, (mtime, mtime))

    root_s = str(tmp_path / "stream_root")
    root_g = str(tmp_path / "golden_root")
    shards.init_sharded_ingest(spark, corpus, root_s, n_shards=2)
    shards.init_sharded_ingest(spark, corpus, root_g, n_shards=2)

    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stats = run_stream_ingest_sharded(stream, root_s)
    assert len(stats) == 2  # one dict per micro-batch
    for batch in (a, b):
        shards.ingest_batch_sharded(spark, batch, root_g)
    assert _dig(shards.read_sharded_corpus(spark, root_s)) == _dig(
        shards.read_sharded_corpus(spark, root_g)
    )


def test_null_text_routes_to_shard_zero_and_is_accounted(
    spark, sf_dir, tmp_path
):
    """NULL text routes to shard 0 EXPLICITLY (review r12: xxhash64
    hashes NULL to its seed 42, so the implementation-default route
    would be pmod(42, n) — n_shards-dependent). The explicit branch
    pins the invariant at ANY shard count, and the routed rows get
    exactly the single-root treatment (exact tier drops
    null-fingerprint docs, counted in n_exact_dropped — verified
    identical on a single-root run)."""
    # the invariant holds at shard counts where pmod(42, n) != 0 too
    for n in (2, 4, 5):
        row = spark.range(1).select(
            shards.shard_route(F.lit(None).cast("string"), n).alias("s")
        ).first()
        assert row["s"] == 0, n
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 100).select("doc_id", "text")
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(spark, corpus, root, n_shards=2)
    nulls = spark.createDataFrame(
        [(70001, None), (70002, None)], "doc_id long, text string"
    )
    stats = shards.ingest_batch_sharded(spark, nulls, root)
    assert list(stats) == [0]
    # same semantics as the single-root loop: processed AND accounted
    assert stats[0].n_batch == 2
    assert stats[0].n_exact_dropped == 2 and stats[0].n_published == 0


@pytest.mark.slow
def test_fuzz_concurrent_equals_serialized(spark, tmp_path):
    """Seeded fuzz of the shard-independence claim: random sparse
    corpora with planted exact dups and near-dups, random shard counts,
    two batches ticked CONCURRENTLY vs one-at-a-time on twin roots —
    union digests must match in every trial, and replays publish zero."""
    import random as _random

    rng = _random.Random(4242)
    # fast profile: 1 trial (same planted-dup mix and assertions per
    # trial); full profile restores the 3-seed sweep
    for trial in range(prof(1, 3)):
        vocab = [f"t{trial}w{i}" for i in range(300)]

        def doc():
            return " ".join(
                rng.choice(vocab) for _ in range(rng.randint(10, 40))
            )

        corpus_rows = [(i, doc()) for i in range(30)]
        batch_rows = []
        nid = 1000
        for _ in range(20):
            r = rng.random()
            if r < 0.2 and corpus_rows:  # exact dup of corpus under new id
                batch_rows.append((nid, rng.choice(corpus_rows)[1]))
            elif r < 0.35 and corpus_rows:  # near-dup: one word changed
                w = rng.choice(corpus_rows)[1].split()
                w[rng.randrange(len(w))] = "zzz"
                batch_rows.append((nid, " ".join(w)))
            else:
                batch_rows.append((nid, doc()))
            nid += 1
        half = len(batch_rows) // 2
        n_shards = rng.choice([2, 3])
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        b1 = spark.createDataFrame(batch_rows[:half], "doc_id long, text string")
        b2 = spark.createDataFrame(batch_rows[half:], "doc_id long, text string")

        ra = str(tmp_path / f"f{trial}a")
        rb = str(tmp_path / f"f{trial}b")
        shards.init_sharded_ingest(spark, corpus, ra, n_shards=n_shards)
        shards.init_sharded_ingest(spark, corpus, rb, n_shards=n_shards)
        for b in (b1, b2):
            shards.ingest_batch_sharded(spark, b, ra)
            shards.ingest_batch_sharded(spark, b, rb, max_parallel=1)
        assert _dig(shards.read_sharded_corpus(spark, ra)) == _dig(
            shards.read_sharded_corpus(spark, rb)
        ), trial
        stats = shards.ingest_batch_sharded(spark, b1, ra)
        assert all(s.n_published == 0 for s in stats.values()), trial
