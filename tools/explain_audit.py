"""Generate EXPLAIN.md: formatted physical plans for flagship queries.

Run after plan-affecting changes: ``python tools/explain_audit.py``.
Each section shows the Spark physical plan at sf0.1 with the scale
properties worth auditing (pushdown, broadcast, exchange count).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from data_engineering_capstone_project__spark.session import get_spark

AUDIT = {
    "q1_pricing_summary": "full-scan agg: partial+final HashAggregate, one Exchange",
    "q3_shipping_priority": "date filters pushed to scans; filtered customer broadcast; top-k via TakeOrderedAndProject",
    "q7_volume_shipping": "nation-filtered supplier/customer broadcast; one SMJ lineitem⋈orders",
    "q13_order_distribution": "orders aggregated to 1 row/customer BEFORE the customer join",
    "q2_min_cost_supplier": "ONE data exchange for the whole query (r15, guide §2.4): pruned lineitem hash-repartitioned by l_partkey once — the (partkey,suppkey) aggregation's ClusteredDistribution is satisfied by the subset partitioning, the broadcast dim join preserves it, and the per-part window min runs in place (the r14 plan re-shuffled the aggregate a second time for the window); dims broadcast as before",
    "j4_linkage_join": "expression-key equi-join (SMJ), distinct rides the same partitioning",
    "w1_row_number": "no single-partition window: quantile pids + broadcast offsets",
    "x_tf_idf": "doc-frequency as groupBy(term)+join-back (NO per-term window — skew-safe); explode cached once (InMemoryTableScan feeds both branches)",
    "x_bm25": "tf cached once (InMemoryTableScan feeds df/dl/weight branches); dfreq and dl as groupBy+join-back (no per-term or per-doc window); N+avgdl ride ONE broadcast scalar row; avgdl = exact long-sum/count (oracle-parity)",
    "x_bigram_logprob": "ONE posexplode + ONE per-document window lead (partition = a single doc — skew-free, no corpus-wide sort); bigram relation cached once, feeds c2/c1 aggregates + join-back (tf_idf's skew-safe shape); decimal contributions keep per-doc sums order-independent",
    "x_bm25_topk_frame": "DataFrame query set: query frame tokenized by the corpus's own expression; term join carries NO forced broadcast hint (AQE sizes it from the actual query-set width); per-query top-k via WindowGroupLimit",
    "x_exact_dedup": "fingerprint groupBy with map-side partial min",
    "x_weighted_sample": "A-ES weighted top-k: md5→uniform→priority all codegen'd at the scan; global k via TakeOrderedAndProject (per-partition partial top-k + k-bounded merge — NEVER a full Sort+Exchange)",
    "x_bm25_topk": "weights joined to BROADCAST query terms (map-side hash join, no corpus shuffle beyond bm25's aggs); per-query top-k through the WindowGroupLimit map-side prune; decimal score sum is order-independent",
    "x_clean_corpus": "filters+mask fused into one scan project; dedup adds one shuffle",
    "x_topk_per_group": "native WindowGroupLimit plan (selected by the r15 memoized synthetic probe — no per-call physical planning of this tree): spread() parallelizes the map-side Partial prune sort on a small single-file scan (no-op at real scale), ONE exchange of k-per-partition pruned rows, Final prune + window",
    "x_unigram_logprob": "tf cached once (InMemoryTableScan both branches); corpus counts agg+join-back (no per-term window); decimal contributions -> order-independent per-doc sum",
    "x_mix_sources": "per-source thresholds baked as literals -> shuffle-free codegen'd md5 filter at the scan, then one aggregation",
    "x_embedding_near_dups": "multi-table SRP-LSH equi-join on (tbl,bucket) — NO BroadcastNestedLoopJoin/CartesianProduct anywhere",
    "x_ngram_jaccard": "lossless mode (prefilter='none' vs exact oracle): AllPairs prefix filter + PPJoin positional filter in the join condition; shingles via pure-codegen Generate explode(sequence)+substr (NO interpreted transform() HOF — 14x, see SCALING.md). DEFAULT mode is MinHash-prefiltered (banded candidates + signature-estimate prune + exact verify — ~5x at 50k docs, identical pairs; ladder-swept)",
    "x_substring_dedup": "two-tier exact span dedup: winnow detect is a MapInPandas scan (no corpus shuffle) -> count-over-fp window -> per-doc interval merge; refine explodes ONLY shared-run positions, window identity = two xxhash64 longs, first-occurrence owner = ONE min-struct Window over (wh1,wh2) — NO owner join exists (the r4 agg+join-back computed and sorted the corpus-sized hash explode twice); audit: no BroadcastNestedLoopJoin/CartesianProduct, windowspecdefinition(wh1",
    "x_fuzzy_linkage": "PassJoin segment blocking: both sides explode to (block, len, seg-idx, seg-text) keys over DISTINCT projections -> selective equi-join (never a within-block scan); levenshtein only on verified value-tuples; two hash joins rebuild full rows",
    "ref_multistate_e2e": "per-state plans union-by-name; dictionaries broadcast; one DISTINCT per state rides the linkage join's partitioning",
    "x_paragraph_dedup": "posexplode -> groupBy(md5 key) partial+final min -> equi join-back -> per-doc reassembly agg; paragraphs shuffle as md5 keys",
    "x_linear_score": "weights BroadcastHashJoin onto exploded tokens; decimal partial+final agg; no Python anywhere",
    "x_skew_profile": "groupBy-count partial+final; broadcast 1-row totals; TakeOrderedAndProject top-n",
    "x_corpus_shuffle": "epoch order via range partition on md5(key|seed); positions from per-partition row_number + broadcast offsets — no global sort funnel",
    "x_lang_quality_filter": "quantized-domain counts (partial+final agg), cum window over the tiny distinct-value relation, thresholds BroadcastHashJoin'd back to the scan side",
    "x_leakage_split": "both sides are codegen'd md5-threshold filters at the scan (union for the summary) — zero shuffles before the final agg",
    "x_epoch_upsample": "CASE pair + explode(sequence) fan-out map-side; the only exchange is the summary agg's",
    "x_bm25_topk_indexed": "PERSISTED-index retrieval (the production steady state): weights come from a parquet scan of the saved artifact — NO corpus tokenization/explode/agg subtree anywhere in the plan; broadcast query terms + decimal sum + WindowGroupLimit as in x_bm25_topk",
    "ivf_pruned_probe": "cell-partitioned corpus probe (the x_ivf_pruned gate wraps this in driver-side verification, so the audited plan here is the probe itself): the isin(cell) filter appears under PartitionFilters at the scan (pruned at file listing — runtime numPartitions == nprobe), cosine + TakeOrderedAndProject on the surviving cells only",
    "x_ivf_topk_many": "batched IVF: queries cross-join the 1-row centroid FRAME (broadcast; codegen compiles once for any k), probe cells via zipped argsort per QUERY row, corpus joined on cell, per-query top-k through WindowGroupLimit",
    "x_snapshot_diff": "exceptAll both directions: hash aggregates over one exchange per side, union of tagged results — no join, no key assumption",
    "x_rrf_fusion": "hybrid fusion: both source top-k's are already k-per-query sized before the union; one hash agg on (query,doc) of decimal contributions (order-independent), final rank via WindowGroupLimit",
    "x_ingest_loop": "two-round fingerprint loop: each round is one batch-side groupBy(min) + join-back + LEFT ANTI against the (index-sized) fingerprint relation; the admit step is a union+distinct of 32-char keys, never text",
    "x_dsir_select": "DSIR: hashed n-gram featurization is pure codegen at the scan (split + indexed transform + explode + md5/conv); the two bucket-count tables are PERSISTED (r15 — ≤n_buckets rows; each feeds the ratio join AND its total scalar, so the unpersisted plan featurized the TARGET corpus twice — audit: exactly one target subtree remains); the ≤n_buckets-row log-ratio table rides a BroadcastHashJoin onto the gram stream; the ONLY corpus-sized exchange is the per-doc sum (hashpartitioning(doc_id), map-side partials); Gumbel-top-k via TakeOrderedAndProject — audit: no SortMergeJoin, no global Sort",
    "x_dsir_persisted": "PERSISTED-model DSIR (the production steady state): the ratio table comes from a parquet scan of the saved artifact — NO target-corpus subtree and NO raw bucket-count/fit subtree anywhere in the plan (compare x_dsir_select: two count branches + scalar cross-joins); one raw featurization pass, broadcast ratio join, doc-keyed sum, TakeOrderedAndProject",
    "verified_probe": "verified fuzzy decontamination kernel (the x_stream_decontaminate_verified gate wraps it in driver-side set comparisons): batch signatures via explode+groupBy min-hashes; candidate pairs from the (band,bucket) equi-join against the id-carrying index; verify_jaccard shingles ONLY candidate docs (left-semi before the explode; sort-merge pinned for the corpus-sized shingle-array join — never broadcast); final routing is one LEFT ANTI on id",
    "publication_log_read": "ingest publication-log read after bootstrap + 3 ticks (4 committed versions): ONE multi-path parquet relation — a single Scan node whose plan is FLAT in tick count, where the r8 per-version unionByName fold re-analyzed a T-way Union every tick (r9 #1); the verified tick's candidate text fetch semi-joins into this one scan",
    "ingest_select_publish": "DSIR-selection publish semi-join of an ingest tick: dedup survivors (InMemoryTableScan — persisted once per tick) LEFT SEMI the k Gumbel-top-k ids; the broadcast hint appears ONLY under the k<=100k gate (this audit is the small-k form — a large-fraction selection drops the hint and AQE sizes the build side; r9 #2, unit-gated both ways)",
    "bounded_exact_probe": "exact-dedup probe with bounded_batch=True (the ingest tick's exact tier, r9): the corpus-scale fp index joins via BroadcastHashJoin LeftSemi with the BATCH's fingerprints as the build side — ZERO index-side exchanges, where the naive batch-ANTI-index join sort-merge-shuffles the whole index every tick past the broadcast threshold; the final LeftAnti's right side is <= batch-sized",
    "asof_hot_path": "skew-safe as-of join, every key routed hot (r10 — VERDICT r9 #3): the fill window's partition spec is (user_id, _abkt) — windowspecdefinition(user_id, _abkt, ...) — so NO task ever sorts a key's full history (the default plan's windowspecdefinition(user_id, ...) is exactly the skew hazard); per-bucket max_by seeds ride a map-combined ObjectHashAggregate, the hot-key census and seed-carry frames join back via BroadcastHashJoin (bounded: <= rows/threshold keys x n_time_buckets rows), and the seed carry's own window partitions the <=B-row-per-key seed frame only",
    "ivf_pq_probe": "IVF-PQ candidate+rerank (r11 — VERDICT r10 #4): BOTH scan subtrees carry PartitionFilters [ivf_cell IN (...)] (non-probed cells never listed); the CANDIDATE scan's ReadSchema is (vec_id, pq_code, v_norm) — the fp32 embedding column is NOT read for scoring (asymmetric LUT lookups); the rerank side reads (vec_id, embedding) for only the broadcast-semi-joined candidate ids",
    "bm25_bucketed_probe": "bucketed BM25 posting probe (r11 — VERDICT r10 #7): the query terms' hash buckets appear as PartitionFilters [_tb IN (...)] on the posting scan — directories no query term hashes into are pruned at listing time; broadcast query terms, decimal order-independent score sum, WindowGroupLimit top-k as before",
    "bm25_incremental_probe": "INCREMENTAL posting-log probe (r12 — VERDICT r11 #1): ZERO corpus scans anywhere (no re-tokenize — maintenance is O(batch) per tick), every delta version's posting scan carries the query-term PartitionFilters [_tb IN (...)], df_t aggregated from the pruned union, N/avgdl folded in as literals from the per-version meta sums; same broadcast-terms + decimal-sum + WindowGroupLimit tail as the snapshot probes — and hash-equal to them by the oracle gate",
    "sharded_ann_probe": "GLOBAL ANN over a SHARDED living corpus (r14 — VERDICT r13 #1, oracle-gated by x_sharded_ann): one pruned IVF-log probe per shard — each branch's vector scans carry PartitionFilters on that shard's OWN probed cells under its OWN codebook — unioned into a single TakeOrderedAndProject of n_shards x k rows; shards are document-disjoint by content routing, so the merge preserves per-shard probe recall exactly",
    "reconcile_band_log_candidates": "r15 reconcile candidate pass (VERDICT r14 #1, gated by x_shard_reconcile's band_log_equals_single_root): the pair relation reads the persisted per-shard (band, bucket, corpus_id) index logs — parquet scans + one left-semi against the live id projection + a (band,bucket) self-join — with NO shingle explode / xxhash signature aggregate / text column ANYWHERE in the plan (compare verified_probe's text-side branch); candidate generation is O(index log), flat in document length, and text is read only by the later candidate-sized Jaccard verification",
    "ivf_log_probe": "INCREMENTAL IVF vector-log probe (r13 — VERDICT r12 #1): the ingest tick's fenced ANN deltas probed as one union — EVERY delta version's vector scan carries PartitionFilters [ivf_cell IN (...)] (non-probed cell directories never listed, per branch), cosine + TakeOrderedAndProject over the surviving cells only; maintenance is O(batch)/tick (cell assignment is a codegen projection of the batch) and the drift trigger reads per-version metas, zero scans (tools/ivf_ladder.py) — probe hash-equal to ivf_topk of the union by the x_ivf_ingest gate",
}


def _ivf_pruned_probe(spark, sf_dir):
    """Build the pruned IVF probe over a freshly-written cell-partitioned
    corpus (the x_ivf_pruned gate's inner plan, minus the driver-side
    verification wrapper that hides it behind a LocalTableScan)."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = similarity.kmeans_centroids(e, n_centroids=8, n_iter=5, sample_rows=500)
    q = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    tmp = tempfile.mkdtemp(prefix="explain_ivf_")
    similarity.write_ivf_corpus(e, tmp, cents)
    corpus = spark.read.parquet(tmp)
    return similarity.ivf_topk_pruned(corpus, q, cents, k=10, nprobe=4)


def _verified_probe(spark, sf_dir):
    """The raw verified-probe kernel (the gate's plan collapses to a
    LocalTableScan of booleans; this is the plan worth auditing)."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") < 200)
    # derive the banding once and thread it to BOTH sides — probe
    # defaults no longer exist (a mismatched probe raises, VERDICT r8 #3)
    nh, nb = dedup.auto_minhash_config(corpus.count(), 0.9)
    idx = dedup.corpus_minhash_doc_index(corpus, num_hashes=nh, bands=nb)
    return dedup.minhash_band_probe_verified(
        d, idx, corpus, num_hashes=nh, bands=nb, jaccard_threshold=0.9
    )


def _publication_log_read(spark, sf_dir):
    """The ingest publication-log union read after several ticks (r9 #1:
    the per-version unionByName fold was replaced by one multi-path
    scan). Bootstrap + 3 ticks -> 4 committed versions -> read."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.plans import ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = tempfile.mkdtemp(prefix="explain_publog_")
    ingest.init_ingest_indexes(spark, docs.filter(F.col("doc_id") < 100), root)
    for lo in (100, 200, 300):
        d, _ = ingest.ingest_batch(
            spark,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)),
            root,
        )
        d.unpersist()
    return ingest.read_ingest_corpus(spark, root)


def _ingest_select_publish(spark, sf_dir):
    """The DSIR-selection publish stage of an ingest tick (r9 #2: the
    id semi-join's broadcast hint is now gated by k)."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.plans import ingest
    from data_engineering_capstone_project__spark.sources import artifacts as art

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter(F.col("doc_id") >= 300)
    nb = 512
    ratio = text.dsir_fit(raw, docs.filter(F.col("doc_id") < 300), n_buckets=nb)
    mpath = tempfile.mkdtemp(prefix="explain_dsir_") + "/m"
    art.save_dsir_model(ratio, mpath, n_buckets=nb, alpha=1.0, salt="dsir")
    root = tempfile.mkdtemp(prefix="explain_select_")
    ingest.init_ingest_indexes(spark, docs.filter(F.col("doc_id") < 100), root)
    pub, _ = ingest.ingest_batch(
        spark, raw, root, select_cfg={"dsir_path": mpath, "fraction": 0.4}
    )
    return pub


def _bounded_exact_probe(spark, sf_dir):
    """The ingest tick's exact tier with bounded_batch=True (r9): the fp
    index must join via BroadcastHashJoin LeftSemi (build = the batch's
    fingerprints) — zero index-side exchanges."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import dedup
    from data_engineering_capstone_project__spark.streaming.stream import (
        corpus_fingerprint_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = corpus_fingerprint_index(docs.filter(F.col("doc_id") < 2000))
    batch = docs.filter(F.col("doc_id") >= 2000)
    return dedup.dedup_against_corpus(
        batch, corpus_fps=idx, bounded_batch=True
    )


def _asof_hot_path(spark, sf_dir):
    """The bucketed two-phase as-of plan with every key routed hot (the
    x_asof_join_skew gate's inner plan)."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators.asof import asof_join
    from data_engineering_capstone_project__spark.sources.io import load_events

    ev = load_events(spark, sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("sv")
    )
    left = ev.select("event_id", "user_id", "ts")
    return asof_join(
        left, signups, ts_col="ts", by=["user_id"],
        right_value_cols=["sv"], hot_key_threshold=1, n_time_buckets=32,
    )


def _ivf_pq_probe(spark, sf_dir):
    """The IVF-PQ probe over a freshly-encoded cell-partitioned corpus
    (the x_ivf_pq gate wraps it in driver-side verification)."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = similarity.kmeans_centroids(e, n_centroids=8, n_iter=5, sample_rows=500)
    books = similarity.pq_fit(e, m=8, ksub=64, sample_rows=500)
    q = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    tmp = tempfile.mkdtemp(prefix="explain_ivfpq_")
    similarity.write_ivf_corpus(similarity.pq_encode(e, books), tmp, cents)
    corpus = spark.read.parquet(tmp)
    return similarity.ivf_pq_topk(
        corpus, q, cents, books, k=10, nprobe=4, n_candidates=64
    )


def _bm25_incremental_probe(spark, sf_dir):
    """The incremental posting-log probe (r12 — VERDICT r11 #1): two
    appended delta versions, probed without any corpus scan."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.sources import artifacts as art

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="explain_bm25i_") + "/idx"
    for cond in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        postings, stats = text.bm25_postings_with_stats(docs.filter(cond))
        art.save_bm25_postings(postings, tmp, stats=stats)
    return text.bm25_topk_incremental(
        spark,
        tmp,
        {"q_scan": "hash scan filter", "q_stream": "stream window watermark"},
        k=10,
    )


def _ivf_log_probe(spark, sf_dir):
    """The incremental IVF vector-log probe (r13 — VERDICT r12 #1):
    bootstrap + one ticked delta, probed cell-pruned per branch."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import similarity
    from data_engineering_capstone_project__spark.plans import ingest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    all_docs = d.join(e, "doc_id").select("doc_id", "text", "embedding")
    corpus = all_docs.filter(F.col("doc_id") % 2 == 0)
    batch = all_docs.filter(F.col("doc_id") % 2 == 1)
    root = tempfile.mkdtemp(prefix="explain_ivfl_") + "/r"
    ingest.init_ingest_indexes(
        spark, corpus, root,
        ivf_index={
            "vec_col": "embedding", "n_centroids": 8,
            "sample_rows": 500, "n_iter": 5,
        },
    )
    ingest.ingest_batch(spark, batch, root)[0].unpersist()
    q = [float(x) for x in corpus.orderBy("doc_id").first()["embedding"]]
    return similarity.ivf_topk_log(
        spark, f"{root}/ivf", f"{root}/ivf_codebook", q, k=10, nprobe=3
    )


def _sharded_ann_probe(spark, sf_dir):
    """The global sharded ANN probe (r14 — the x_sharded_ann gate's
    plan): two shard-local IVF logs, one merged top-k."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.plans import shards

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    all_docs = d.join(e, "doc_id").select("doc_id", "text", "embedding")
    corpus = all_docs.filter(F.col("doc_id") % 3 < 2)
    batch = all_docs.filter(F.col("doc_id") % 3 == 2)
    root = tempfile.mkdtemp(prefix="explain_sann_") + "/r"
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2,
        ivf_index={
            "vec_col": "embedding", "n_centroids": 4,
            "sample_rows": 500, "n_iter": 5,
        },
    )
    shards.ingest_batch_sharded(spark, batch, root)
    q = [float(x) for x in corpus.orderBy("doc_id").first()["embedding"]]
    return shards.ivf_topk_sharded(spark, root, q, k=10, nprobe=2)


def _reconcile_band_log_candidates(spark, sf_dir):
    """The r15 reconcile candidate relation (VERDICT r14 #1): pairs
    from the persisted id-carrying band logs of a verified sharded
    root — the pair construction `reconcile_sharded_near_dups` runs
    before verification/adjudication, audited for the ABSENCE of any
    text subtree."""
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.plans import (
        ingest as ing,
        shards,
    )
    from data_engineering_capstone_project__spark.sources import (
        artifacts as art,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    root = tempfile.mkdtemp(prefix="explain_recl_") + "/r"
    shards.init_sharded_ingest(
        spark, corpus, root, n_shards=2, num_hashes=32, bands=8,
        verify_jaccard_threshold=0.8,
    )
    shards.ingest_batch_sharded(spark, batch, root)
    logs = []
    for s in range(2):
        rows, _ = art.load_minhash_log(
            spark,
            shards.shard_root(root, s) + "/" + ing._MH,
        )
        logs.append(rows.select("band", "bucket", "corpus_id"))
    log_u = logs[0].unionByName(logs[1])
    live = shards.read_sharded_corpus(spark, root).select(
        F.col("doc_id").alias("corpus_id")
    )
    bl = log_u.join(live, "corpus_id", "left_semi").withColumnRenamed(
        "corpus_id", "doc_id"
    )
    a = bl.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = bl.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _bm25_bucketed_probe(spark, sf_dir):
    """The partition-pruned posting probe (the x_bm25_topk_indexed
    gate's query-path plan over a bucketed index)."""
    import tempfile

    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.sources import artifacts as art

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="explain_bm25b_") + "/idx"
    art.save_bm25_index(
        text.bm25(docs), tmp, corpus_digest="audit",
        n_term_buckets=text._BM25_TERM_BUCKETS,
    )
    w = art.load_bm25_index(spark, tmp)
    return text.bm25_topk(
        None,
        {"q_scan": "hash scan filter", "q_stream": "stream window watermark"},
        k=10,
        weights=w,
    )


CUSTOM = {
    "reconcile_band_log_candidates": _reconcile_band_log_candidates,
    "ivf_pruned_probe": _ivf_pruned_probe,
    "ivf_pq_probe": _ivf_pq_probe,
    "bm25_bucketed_probe": _bm25_bucketed_probe,
    "bm25_incremental_probe": _bm25_incremental_probe,
    "ivf_log_probe": _ivf_log_probe,
    "sharded_ann_probe": _sharded_ann_probe,
    "asof_hot_path": _asof_hot_path,
    "verified_probe": _verified_probe,
    "publication_log_read": _publication_log_read,
    "ingest_select_publish": _ingest_select_publish,
    "bounded_exact_probe": _bounded_exact_probe,
}


def main() -> None:
    spark = get_spark(app_name="explain_audit")
    sf_dir = "/root/testdata/sf0.1"
    qs = entrymod.queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# EXPLAIN — physical-plan audit (sf0.1, local[32])",
        "",
        "Generated by `python tools/explain_audit.py`. Things to check per",
        "plan: `PushedFilters` at the scan, `ReadSchema` pruned to used",
        "columns, dimension joins as `BroadcastHashJoin`, no unexpected",
        "`Exchange`, aggregates split partial/final.",
        "",
    ]
    for name, note in AUDIT.items():
        df = CUSTOM[name](spark, sf_dir) if name in CUSTOM else qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        tree = plan.split("\n\n")[0]
        # partition pruning lives in the node DETAILS, not the tree —
        # surface any non-empty PartitionFilters so the audit is visible
        pf = [
            ln.strip()
            for ln in plan.splitlines()
            if "PartitionFilters" in ln and "[]" not in ln.replace(" ", "")
        ]
        if pf:
            tree += "\n" + "\n".join(f"-- {x}" for x in pf)
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{note}*")
        out.append("")
        out.append("```")
        out.append(tree)
        out.append("```")
        out.append("")
    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
