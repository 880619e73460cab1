"""Round-15 hardening units (VERDICT r14 #3/#5 + ADVICE r14):
frame-valued retirement past the broadcast cap, the path-carrying
heal marker, strict marker-read error posture, the streaming loop
surviving a refused reconcile, and reshard's digest-divergence
cleanup."""

from __future__ import annotations

import builtins
import json
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import text as text_ops
from data_engineering_capstone_project__spark.plans import ingest, shards
from data_engineering_capstone_project__spark.sources import artifacts as art


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )


def _bootstrap_with_indexes(spark, sf_dir, root, n=200):
    d = _docs(spark, sf_dir)
    e = _embs(spark, sf_dir)
    all_docs = d.join(e, "doc_id").select("doc_id", "text", "embedding")
    corpus = all_docs.filter(F.col("doc_id") < n)
    ingest.init_ingest_indexes(
        spark, corpus, root, bm25_index=True,
        ivf_index={
            "vec_col": "embedding", "n_centroids": 4,
            "sample_rows": 300, "n_iter": 4,
        },
    )
    return corpus, all_docs


def _assert_surface_is_corpus(spark, root):
    now = ingest.read_ingest_corpus(spark, root)
    n_now = now.count()
    _, bmeta = art.load_bm25_postings_log(spark, f"{root}/bm25")
    assert bmeta["totals"]["n_docs"] == n_now
    imeta, _ = art.load_ivf_log_stats(f"{root}/ivf")
    assert imeta["n_vectors"] == n_now
    Q = {"q": "hash scan filter"}
    got = sorted(
        map(
            tuple,
            text_ops.bm25_topk_incremental(
                spark, f"{root}/bm25", Q, k=5
            ).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            text_ops.bm25_topk(
                now.select("doc_id", "text"), Q, k=5, weights=None
            ).collect(),
        )
    )
    assert got == ref


# ------------------------------------------- frame-valued retirement


@pytest.mark.slow
def test_retire_docs_frame_valued_over_broadcast_cap(
    spark, sf_dir, tmp_path
):
    """VERDICT r14 #5: retire_docs accepts a DataFrame of ids — here
    >1.2M ids (past _RETIRE_BROADCAST_CAP, so every exclusion join
    runs WITHOUT the broadcast hint) — with no driver materialization
    of the loser set. The heal marker carries a PATH; the corpus and
    every search surface land exactly as a list-valued retirement
    of the same (present) ids would."""
    root = str(tmp_path / "r")
    corpus, _ = _bootstrap_with_indexes(spark, sf_dir, root)
    n0 = corpus.count()
    present = corpus.limit(10).select("doc_id")
    absent = spark.range(10_000_000, 11_250_000).select(
        F.col("id").alias("doc_id")
    )
    losers = present.unionByName(absent)

    v = ingest.retire_docs(spark, root, losers)
    assert v > 0
    assert ingest.read_ingest_corpus(spark, root).count() == n0 - 10
    assert not os.path.exists(os.path.join(root, "_RETIRE_PENDING.json"))
    assert not os.path.exists(os.path.join(root, "_RETIRE_IDS"))
    _assert_surface_is_corpus(spark, root)
    # the CDC note records the true loser count, sample capped at 100k
    cpath = os.path.join(root, "corpus")
    vs = ingest._visible_corpus_versions(cpath)
    with open(os.path.join(cpath, f"v={max(vs)}", "_RETIRED.json")) as f:
        note = json.load(f)
    assert note["n"] == 1_250_010
    assert len(note["ids"]) == 100_000


def test_retire_frame_marker_heals_from_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A frame-valued retirement that crashes between the corpus fold
    commit and the index refolds leaves a marker whose ids live as
    parquet under root/_RETIRE_IDS (written BEFORE the marker) — the
    next maintenance action heals both refolds from the path and
    removes marker + ids dir."""
    root = str(tmp_path / "r")
    corpus, _ = _bootstrap_with_indexes(spark, sf_dir, root)
    losers = corpus.limit(8).select("doc_id")

    def boom(*a, **k):
        raise RuntimeError("injected crash before bm25 refold")

    real = art.save_bm25_postings
    monkeypatch.setattr(art, "save_bm25_postings", boom)
    with pytest.raises(RuntimeError, match="bm25 refold"):
        ingest.retire_docs(spark, root, losers)
    monkeypatch.setattr(art, "save_bm25_postings", real)

    mpath = os.path.join(root, "_RETIRE_PENDING.json")
    assert os.path.exists(mpath)
    with open(mpath) as f:
        m = json.load(f)
    assert m["ids_path"] == "_RETIRE_IDS" and m["n"] == 8
    assert "ids" not in m
    assert os.path.isdir(os.path.join(root, "_RETIRE_IDS"))

    ingest.compact_publication_log(spark, root)
    assert not os.path.exists(mpath)
    assert not os.path.exists(os.path.join(root, "_RETIRE_IDS"))
    _assert_surface_is_corpus(spark, root)


@pytest.mark.slow
def test_reconcile_distributed_retires_frame_valued(
    spark, sf_dir, tmp_path
):
    """The distributed adjudication path retires through DataFrame
    slices (VERDICT r14 #5): its _RETIRED CDC notes must appear on the
    losing shards and the result must still match the driver path's
    verdicts on a twin root."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    later = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        corpus.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 700001).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qz")).alias("text"),
        )
    )

    def build(root):
        shards.init_sharded_ingest(
            spark, corpus, root, n_shards=2, num_hashes=32, bands=8
        )
        shards.ingest_batch_sharded(spark, later, root)

    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    build(ra)
    build(rb)
    out_d = shards.reconcile_sharded_near_dups(spark, ra)
    out_x = shards.reconcile_sharded_near_dups(spark, rb, distributed=True)
    assert out_d["path"] == "driver" and out_x["path"] == "distributed"
    assert out_d["retired_per_shard"] == out_x["retired_per_shard"]
    assert out_d["n_retired"] > 0

    def dig(root):
        return (
            shards.read_sharded_corpus(spark, root)
            .agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("doc_id", "text")).alias("x"),
            )
            .first()
        )

    assert dig(ra) == dig(rb)


# --------------------------------------------- heal marker error posture


@pytest.mark.slow
def test_heal_marker_torn_write_clears_without_refold(
    spark, sf_dir, tmp_path
):
    """A marker holding unparseable content is the torn-write signal
    (the marker lands before the fold commit, so torn == nothing
    retired): the heal clears it and touches nothing."""
    root = str(tmp_path / "r")
    corpus, _ = _bootstrap_with_indexes(spark, sf_dir, root)
    n0 = corpus.count()
    mpath = os.path.join(root, "_RETIRE_PENDING.json")
    with open(mpath, "w") as f:
        f.write('{"corpus_version": 1, "ids_pa')  # torn mid-write
    ingest.compact_publication_log(spark, root)
    assert not os.path.exists(mpath)
    assert ingest.read_ingest_corpus(spark, root).count() == n0
    _assert_surface_is_corpus(spark, root)


@pytest.mark.slow
def test_heal_marker_read_oserror_reraises_and_preserves_marker(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r14: a TRANSIENT read failure of the marker must NOT be
    treated as a torn write — discarding durable retirement intent
    would leave the search indexes a superset forever. The heal
    re-raises and the marker survives for the next maintenance
    action, which then heals normally."""
    root = str(tmp_path / "r")
    corpus, _ = _bootstrap_with_indexes(spark, sf_dir, root)
    losers = [r["doc_id"] for r in corpus.limit(5).collect()]

    def boom(*a, **k):
        raise RuntimeError("injected crash before bm25 refold")

    real_save = art.save_bm25_postings
    monkeypatch.setattr(art, "save_bm25_postings", boom)
    with pytest.raises(RuntimeError, match="bm25 refold"):
        ingest.retire_docs(spark, root, losers)
    monkeypatch.setattr(art, "save_bm25_postings", real_save)

    mpath = os.path.join(root, "_RETIRE_PENDING.json")
    real_open = builtins.open

    def flaky_open(file, *a, **k):
        if isinstance(file, str) and file == mpath:
            raise OSError("transient I/O failure")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", flaky_open)
    with pytest.raises(OSError, match="transient"):
        ingest._heal_pending_retirement(spark, root, None)
    monkeypatch.setattr(builtins, "open", real_open)
    assert os.path.exists(mpath)  # intent preserved

    ingest.compact_publication_log(spark, root)  # next action heals
    assert not os.path.exists(mpath)
    _assert_surface_is_corpus(spark, root)


# ------------------------------------------- streaming reconcile refusal


def test_stream_loop_survives_refused_reconcile(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r14: a cadence reconcile that REFUSES (ValueError — the
    duplicate-id check) must not tear down the streaming loop; it is
    reported through on_reconcile_error and ingest continues."""
    import shutil as _sh

    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 120)
    batch = d.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 160))

    src = str(tmp_path / "src")
    os.makedirs(src)
    stage = str(tmp_path / "stage")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    _sh.move(os.path.join(stage, part), os.path.join(src, "b.parquet"))

    root = str(tmp_path / "s")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8
    )

    def refuse(*a, **k):
        raise ValueError("duplicate doc_id values across the sharded union")

    monkeypatch.setattr(shards, "reconcile_sharded_near_dups", refuse)
    seen = []
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stats = shards.run_stream_ingest_sharded(
        stream, root, reconcile_every=1,
        on_reconcile_error=seen.append,
    )
    assert len(stats) == 1  # the tick itself completed
    assert len(seen) == 1 and "duplicate" in str(seen[0])
    published = sum(s.n_published for s in stats[0].values())
    assert published > 0
    n = shards.read_sharded_corpus(spark, root).count()
    assert n == corpus.count() + published


# ------------------------------------------- reshard divergence cleanup


def test_reshard_digest_divergence_removes_half_built_root(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r14: on digest divergence the half-built (undeclared)
    new root is REMOVED, so a re-run against the SAME new_root can
    succeed instead of appending second bootstrap versions that make
    the digest check unpassable forever."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 150)
    root = str(tmp_path / "old")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8
    )

    real = art.corpus_digest
    calls = {"n": 0}

    def skew(df, cols=None):
        # call 1 is reshard's dg_old; later calls include
        # init_sharded_ingest's internal digests AND the final dg_new
        # — skewing them all still only diverges the old-vs-new check
        calls["n"] += 1
        out = real(df, cols)
        return out + "-skewed" if calls["n"] >= 2 else out

    nroot = str(tmp_path / "new")
    monkeypatch.setattr(art, "corpus_digest", skew)
    with pytest.raises(RuntimeError, match="digest diverged"):
        shards.reshard(spark, root, nroot, n_shards=3)
    monkeypatch.setattr(art, "corpus_digest", real)

    assert not os.path.exists(os.path.join(nroot, "_SHARDS.json"))
    for s in range(3):
        assert not os.path.exists(shards.shard_root(nroot, s))

    # the SAME new_root now succeeds
    res = shards.reshard(spark, root, nroot, n_shards=3)
    assert res["n_shards"] == 3
    assert shards.read_sharded_corpus(spark, nroot).count() == corpus.count()


# ------------------------------------------- arrival-stamp backfill


def _strip_stamps(spark, shard_root_path):
    """Simulate a pre-r14 shard: remove _arrival_round from every
    visible corpus version's payload (keeping claim/commit markers)
    and rewrite the schema notes to match."""
    import shutil as _sh

    cpath = os.path.join(shard_root_path, "corpus")
    for v in ingest._visible_corpus_versions(cpath):
        vdir = os.path.join(cpath, f"v={v}")
        df = spark.read.parquet(vdir)
        if "_arrival_round" not in df.columns:
            continue
        stripped = df.drop("_arrival_round").persist()
        stripped.count()
        tmp = vdir + "_tmp"
        stripped.write.parquet(tmp)
        stripped.unpersist()
        for fn in os.listdir(vdir):
            if fn.startswith("part-") or fn == "_SUCCESS":
                os.remove(os.path.join(vdir, fn))
        for fn in os.listdir(tmp):
            if fn.startswith("part-"):
                _sh.move(os.path.join(tmp, fn), os.path.join(vdir, fn))
        _sh.rmtree(tmp, ignore_errors=True)
        ingest._write_schema_note(spark.read.parquet(vdir), cpath, v)


@pytest.mark.slow
def test_backfill_arrival_stamps_converges_legacy_root(
    spark, sf_dir, tmp_path
):
    """VERDICT r14 #4: a wholly pre-stamp root (bootstrap + one tick,
    stamps stripped) reads every row as round 0, so its cross-shard
    near-dup ties are permanently mutual survivors — reconcile retires
    NOTHING. backfill_arrival_stamps restamps each version with its
    version number (the pre-stamp arrival clock), after which the same
    root reconciles IDENTICALLY to a born-stamped twin."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    later = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        corpus.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 700001).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qz")).alias("text"),
        )
    )

    def build(root):
        shards.init_sharded_ingest(
            spark, corpus, root, n_shards=2, num_hashes=32, bands=8
        )
        shards.ingest_batch_sharded(spark, later, root)

    legacy, twin = str(tmp_path / "legacy"), str(tmp_path / "twin")
    build(legacy)
    build(twin)
    for s in range(2):
        _strip_stamps(spark, shards.shard_root(legacy, s))

    # pre-backfill posture: all-round-0 ties — nothing retires
    out0 = shards.reconcile_sharded_near_dups(spark, legacy)
    assert out0["n_retired"] == 0 and out0["n_pairs"] > 0

    res = shards.backfill_arrival_stamps(spark, legacy)
    assert res["max_round"] >= 2
    # idempotent: already-stamped rows untouched, ledger monotone
    res2 = shards.backfill_arrival_stamps(spark, legacy)
    assert res2["max_round"] == res["max_round"]

    out_l = shards.reconcile_sharded_near_dups(spark, legacy)
    out_t = shards.reconcile_sharded_near_dups(spark, twin)
    assert out_l["retired_per_shard"] == out_t["retired_per_shard"]
    assert out_l["n_retired"] == out_t["n_retired"] > 0

    def dig(root):
        return (
            shards.read_sharded_corpus(spark, root)
            .agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("doc_id", "text")).alias("x"),
            )
            .first()
        )

    assert dig(legacy) == dig(twin)
    # the next tick claims a strictly later round than any backfilled
    # stamp: a fresh near-dup of legacy content still retires
    assert shards._current_round(legacy) >= res["max_round"]


# ---------------------------------------- band-log candidate generation


@pytest.mark.slow
def test_reconcile_band_log_candidates_match_recompute(
    spark, sf_dir, tmp_path
):
    """VERDICT r14 #1: on a VERIFIED root the reconcile candidate pass
    self-joins the persisted per-shard (band, bucket, corpus_id) logs
    instead of re-MinHashing the union's text — and must land
    HASH-EQUAL to the recompute path AND to the verified single-root
    golden, including after compaction has folded the band logs."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    later = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        corpus.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 700001).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qz")).alias("text"),
        )
    )

    def build_sharded(root):
        shards.init_sharded_ingest(
            spark, corpus, root, n_shards=2, num_hashes=32, bands=8,
            verify_jaccard_threshold=0.8,
        )
        shards.ingest_batch_sharded(spark, later, root)
        shards.compact_sharded_ingest(spark, root)

    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    build_sharded(ra)
    build_sharded(rb)
    groot = str(tmp_path / "g")
    ingest.init_ingest_indexes(
        spark, corpus, groot, num_hashes=32, bands=8,
        verify_jaccard_threshold=0.8,
    )
    pub, _ = ingest.ingest_batch(spark, later, groot)
    pub.unpersist()

    out_log = shards.reconcile_sharded_near_dups(spark, ra)  # auto: logs
    out_rec = shards.reconcile_sharded_near_dups(
        spark, rb, use_band_logs=False
    )
    assert out_log["n_retired"] == out_rec["n_retired"] > 0
    assert out_log["retired_per_shard"] == out_rec["retired_per_shard"]

    def dig(df):
        return (
            df.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("doc_id", "text")).alias("x"),
            ).first()
        )

    a = dig(shards.read_sharded_corpus(spark, ra).select("doc_id", "text"))
    b = dig(shards.read_sharded_corpus(spark, rb).select("doc_id", "text"))
    g = dig(ingest.read_ingest_corpus(spark, groot).select("doc_id", "text"))
    assert a == b == g

    # idempotent on the log path too (retired ids are live-filtered out)
    again = shards.reconcile_sharded_near_dups(spark, ra)
    assert again["n_retired"] == 0
    assert dig(
        shards.read_sharded_corpus(spark, ra).select("doc_id", "text")
    ) == g


def test_reconcile_band_logs_refused_on_unverified_root(
    spark, sf_dir, tmp_path
):
    """An id-less minhash_bands root cannot source candidate PAIRS
    from its logs: use_band_logs=True refuses loudly; the default
    (auto) silently stays on the recompute path."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 150)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8
    )
    with pytest.raises(ValueError, match="minhash_bands"):
        shards.reconcile_sharded_near_dups(spark, root, use_band_logs=True)
    out = shards.reconcile_sharded_near_dups(spark, root)  # recompute path
    assert out["n_retired"] == 0


# ------------------------------------------- snapshot-then-catchup


@pytest.mark.slow
def test_reshard_catchup_carries_midrebuild_tick(spark, sf_dir, tmp_path):
    """VERDICT r14 #2: reshard(catchup=True) bootstraps the new root
    LEASELESSLY from a snapshot and takes the leases only to replay
    the delta — a tick published mid-rebuild (inside _catchup_hook,
    the post-snapshot pre-lease window) must be present in the
    verified new root, ticks are still excluded during the leased
    phase, and the new root is immediately tickable."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 150)
    mid = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 190))
    fresh = d.filter((F.col("doc_id") >= 190) & (F.col("doc_id") < 220))
    root = str(tmp_path / "old")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8,
        bm25_index=True,
    )

    published_mid = {}

    def catchup_hook():
        st = shards.ingest_batch_sharded(spark, mid, root)
        published_mid["n"] = sum(s.n_published for s in st.values())

    raced = {}

    def leased_hook():
        with pytest.raises(ingest.ConcurrentIngestError):
            shards.ingest_batch_sharded(spark, fresh, root)
        raced["hit"] = True

    nroot = str(tmp_path / "new")
    res = shards.reshard(
        spark, root, nroot, n_shards=3, catchup=True,
        _catchup_hook=catchup_hook, _test_hook=leased_hook,
    )
    assert raced.get("hit")
    assert published_mid["n"] > 0
    assert res["n_catchup"] == published_mid["n"]
    assert res["n_shards"] == 3

    def dig(df):
        return (
            df.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("doc_id", "text")).alias("x"),
            ).first()
        )

    old_u = shards.read_sharded_corpus(spark, root).select("doc_id", "text")
    new_u = shards.read_sharded_corpus(spark, nroot).select("doc_id", "text")
    assert dig(old_u) == dig(new_u)
    # global BM25 over the new logs matches the old (delta postings
    # appended raw, scalars exact by the incremental-log contract)
    Q = {"q": "hash scan filter"}
    olds = sorted(
        map(
            tuple,
            text_ops.bm25_topk_incremental(
                spark, shards.sharded_bm25_paths(root), Q, k=10
            ).collect(),
        )
    )
    news = sorted(
        map(
            tuple,
            text_ops.bm25_topk_incremental(
                spark, shards.sharded_bm25_paths(nroot), Q, k=10
            ).collect(),
        )
    )
    assert olds == news
    # declared and immediately tickable; re-arrivals of ANY published
    # content (bootstrap + mid-rebuild delta) drop on the new layout
    st = shards.ingest_batch_sharded(
        spark, corpus.unionByName(mid).unionByName(fresh), nroot
    )
    n_pub = sum(s.n_published for s in st.values())
    st_fresh_only = shards.ingest_batch_sharded(spark, fresh, nroot)
    assert sum(s.n_published for s in st_fresh_only.values()) == 0
    assert n_pub <= fresh.count()  # corpus+mid all dropped as dups


@pytest.mark.slow
def test_reshard_catchup_divergence_cleans_and_raises(
    spark, sf_dir, tmp_path
):
    """The catchup digest gate: content REMOVED during the leaseless
    rebuild (a retirement — something the delta replay cannot express)
    fails verification, removes the half-built new root, and raises
    with the reconcile-scheduling guidance."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 150)
    root = str(tmp_path / "old")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8
    )
    victim = [
        r["doc_id"]
        for r in ingest.read_ingest_corpus(
            spark, shards.shard_root(root, 0)
        ).limit(1).collect()
    ]

    def retire_mid_rebuild():
        ingest.retire_docs(spark, shards.shard_root(root, 0), victim)

    nroot = str(tmp_path / "new")
    with pytest.raises(RuntimeError, match="digest diverged"):
        shards.reshard(
            spark, root, nroot, n_shards=3, catchup=True,
            _catchup_hook=retire_mid_rebuild,
        )
    assert not os.path.exists(os.path.join(nroot, "_SHARDS.json"))
    for s in range(3):
        assert not os.path.exists(shards.shard_root(nroot, s))


def test_partially_stamped_root_reads_and_reshards(
    spark, sf_dir, tmp_path
):
    """ADVICE r14 (first low): a root where only SOME shards carry
    _arrival_round (one shard stripped to simulate a pre-stamp
    publisher) must read with with_arrival=True (missing column fills
    NULL via allowMissingColumns) and reshard cleanly — stripped rows
    land round-0 semantics, stamped rows carry verbatim."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") < 150)
    root = str(tmp_path / "r")
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8
    )
    _strip_stamps(spark, shards.shard_root(root, 0))

    u = shards.read_sharded_corpus(spark, root, with_arrival=True)
    assert "_arrival_round" in u.columns
    assert u.count() == corpus.count()
    n_null = u.filter(F.col("_arrival_round").isNull()).count()
    assert 0 < n_null < corpus.count()  # genuinely mixed

    nroot = str(tmp_path / "n")
    res = shards.reshard(spark, root, nroot, n_shards=3)
    assert res["n_shards"] == 3
    assert shards.read_sharded_corpus(spark, nroot).count() == corpus.count()
