"""Structured Streaming surface (SURVEY.md §2.9 — absent in the reference;
provided as engine capability for event streams).

Batch expressions from ``streaming.windows`` are reused verbatim — the same
``F.window`` aggregation runs under ``readStream`` with a watermark. For
tests/smoke, a parquet directory drives the stream and a memory sink +
``processAllAvailable()`` makes execution synchronous and deterministic.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (nanos ts handled as in
    ``sources.io.load_events``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from data_engineering_capstone_project__spark.sources.io import (
        read_parquet_cached,
    )

    batch = read_parquet_cached(spark, f"{sf_dir}/events.parquet")
    # readStream needs a directory source; glob-filter to the events file
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(batch.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif ts_type == "timestamp_ntz":
        # micros-NTZ testdata: watermarks require TIMESTAMP (LTZ); the
        # cast preserves the instant only under a UTC session — enforced.
        from data_engineering_capstone_project__spark.sources.io import (
            require_utc_session,
        )

        require_utc_session(spark, "stream_events")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_stream_agg(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregation on a stream — identical
    expression shape to the batch ``tumbling_agg``."""
    win = F.window(F.col(ts_col), duration)
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def run_stream_to_table(df: DataFrame, mode: str = "complete") -> DataFrame:
    """Drive a (bounded) stream to completion into a memory sink and return
    the result as a batch DataFrame. Synchronous; for tests and the driver
    contract's rows-only streaming checks."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def sessionize_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native streaming sessionization: ``F.session_window`` merges events
    within ``gap`` of each other into one growing window per key; the
    watermark closes sessions (and evicts their state) once no more
    in-horizon events can extend them.

    Semantics match the batch lag-based ``windows.sessionize`` grouping:
    a session is a maximal chain of events with inter-event gaps < gap.
    Returns (key, session_start, session_end, n_events) — one row per
    CLOSED session in append mode.
    """
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
    )
    return out.select(
        key_col,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first event per key within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    The streaming member of the dedup ladder (exact tier of
    ``operators.dedup``): state holds one entry per distinct key seen in
    the last ``watermark`` of event time and is evicted as the watermark
    advances — bounded state, unlike a plain ``dropDuplicates`` on a
    stream which retains every key forever. Duplicates arriving later
    than the watermark are NOT caught (that is the contract: state must
    be evictable at 100 TB/day ingest).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (schema from the batch
    reader; glob-filtered directory source, one file per micro-batch) —
    the ingest shape of a continuously-arriving training-data feed."""
    from data_engineering_capstone_project__spark.sources.io import (
        read_parquet_cached,
    )

    batch = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def corpus_fingerprint_index(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The STATIC side of streaming decontamination: one row per distinct
    normalized-text fingerprint in the corpus (the same md5-over-
    whitespace-normalized-lowercase key ``exact_dedup`` shuffles on).
    At 100 TB this index is written once (ideally bucketed by ``fp``)
    and re-read by every ingest stream — it is a DISTINCT projection of
    32-char keys, orders of magnitude smaller than the corpus text."""
    from data_engineering_capstone_project__spark.operators.text import (
        fingerprint,
    )

    return corpus.select(fingerprint(F.col(text_col)).alias("fp")).distinct()


def extend_fingerprint_index(
    index: DataFrame, admitted: DataFrame, text_col: str = "text"
) -> DataFrame:
    """ADMIT newly-ingested documents into an exact-fingerprint dedup
    index: the union of the existing index and the admitted batch's
    distinct fingerprints — the write-back half of the incremental
    ingest loop (``dedup_against_corpus`` / ``decontaminate_stream``
    drop what the index already holds; this makes the survivors part of
    the index so the NEXT batch dedups against them too).

    Work is batch-sized plus an index-sized distinct; persist the result
    as a new artifact version (``sources.artifacts.save_fingerprint_index``
    — atomic swap, so concurrent readers keep probing the old version
    until the new one commits)."""
    batch_fps = corpus_fingerprint_index(admitted, text_col=text_col)
    return index.unionByName(batch_fps).distinct()


def decontaminate_stream(
    stream: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    keep: str = "clean",
) -> DataFrame:
    """Stream-STATIC decontamination: route incoming documents by exact-
    fingerprint membership in a static corpus index — the streaming
    member of the dedup/decontamination ladder (a training-data ingest
    pipeline drops documents already in the training set, or — with
    ``keep='contaminated'`` — surfaces benchmark leaks as they arrive).

    ``keep='clean'``: pass documents whose fingerprint is NOT in the
    index (stream-static LEFT OUTER join + null filter — Structured
    Streaming has no stream-static anti join, but the null-filtered
    outer join is the supported equivalent and stays STATELESS: the
    static side is just a lookup, so there is no watermark, no state
    store, and no late-data semantics to reason about).
    ``keep='contaminated'``: the LEFT SEMI form. Either way each
    micro-batch is a hash join against the (broadcastable) index.
    """
    from data_engineering_capstone_project__spark.operators.text import (
        fingerprint,
    )

    if keep not in ("clean", "contaminated"):
        raise ValueError(f"decontaminate_stream: unknown keep={keep!r}")
    tagged = stream.withColumn("_fp", fingerprint(F.col(text_col)))
    idx = F.broadcast(corpus_fps.select(F.col("fp"), F.lit(True).alias("_hit")))
    if keep == "contaminated":
        return tagged.join(
            idx.drop("_hit"), tagged["_fp"] == F.col("fp"), "left_semi"
        ).drop("_fp")
    return (
        tagged.join(idx, tagged["_fp"] == F.col("fp"), "left_outer")
        .filter(F.col("_hit").isNull())
        .drop("_fp", "fp", "_hit")
    )


def decontaminate_stream_fuzzy(
    stream: DataFrame,
    band_index: DataFrame,
    num_hashes: int,
    bands: int,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "clean",
    sink_path: str | None = None,
    bounded_batch: bool = True,
) -> DataFrame:
    """Stream-static NEAR-dup decontamination: route arriving documents by
    banded-MinHash membership in a static corpus index — the fuzzy upgrade
    of :func:`decontaminate_stream` (VERDICT r6 next-round #5). Exact
    fingerprints catch byte-level re-ingests; this tier also drops
    documents that are near-duplicates (Jaccard ≥ the threshold the index
    was banded for) of anything already in the training set.

    ``band_index`` is ``operators.dedup.corpus_minhash_band_index`` output
    — distinct ``(band, bucket)`` rows, typically reloaded via
    ``sources.artifacts.load_minhash_index`` (which also returns the
    ``num_hashes``/``bands``/``shingle_k`` config the index was built
    with; the stream side MUST use the same config or nothing collides).

    Implementation is ``foreachBatch``: each micro-batch runs the exact
    BATCH probe kernel (``minhash_band_probe`` — vectorized shingle
    explode + signature aggregation + two semi/anti joins), so the
    streaming guard's per-document decision is IDENTICAL BY CONSTRUCTION
    to the batch path (same hash seeds, same banding expressions). This
    is the scalable shape for a signature computation that needs a
    groupBy: a per-row higher-order min-hash expression would be
    interpreted CodegenFallback (the SRP lesson), and a streaming
    aggregation would drag in state-store semantics the guard doesn't
    need — inside foreachBatch the micro-batch is a plain bounded frame.

    Synchronous driver (bounded sources / tests): processes all available
    input and returns the routed result as a batch DataFrame. With
    ``sink_path`` the per-batch output is also appended as parquet (the
    production sink; exactly-once per micro-batch relies on the sink's
    idempotence — use the versioned sink for atomic publishing).

    ``bounded_batch`` (default True — micro-batches are bounded by
    definition) flips the probe joins so the BATCH's band rows are the
    broadcast build side and the corpus-scale index streams map-side
    with zero index exchanges (the same flip ``ingest_batch`` gates by
    count). Set False only if the source is configured with unbounded
    triggers whose micro-batches may rival the index in size.
    """
    from data_engineering_capstone_project__spark.operators.dedup import (
        minhash_band_probe,
    )

    spark = stream.sparkSession
    acc: list[DataFrame] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = minhash_band_probe(
            batch_df,
            band_index,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            keep=keep,
            bounded_batch=bounded_batch,
        )
        if sink_path is not None:
            routed.write.mode("append").parquet(sink_path)
        else:
            # bounded test/driver path: accumulate micro-batch results as
            # a persisted union (each micro-batch is small by definition)
            acc.append(routed.persist())
            acc[-1].count()

    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if sink_path is not None:
        return spark.read.parquet(sink_path)
    out = spark.createDataFrame([], stream.schema)
    for part in acc:
        out = out.unionByName(part)
    return out


def decontaminate_stream_verified(
    stream: DataFrame,
    doc_index: DataFrame,
    corpus: DataFrame,
    num_hashes: int,
    bands: int,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "clean",
    sink_path: str | None = None,
    bounded_batch: bool = True,
) -> DataFrame:
    """Stream-static VERIFIED near-dup decontamination: the precision
    upgrade of :func:`decontaminate_stream_fuzzy`. Arriving documents
    that band-collide with the id-carrying corpus index
    (``operators.dedup.corpus_minhash_doc_index``) are verified by
    EXACT shingle-set Jaccard against the colliding corpus documents'
    text, and dropped only on a proven Jaccard ≥ ``jaccard_threshold``
    — a false-positive band collision no longer costs a good document.

    ``corpus`` is the text lookup side (only CANDIDATE corpus docs are
    fetched and shingled per micro-batch; at 100 TB keep it bucketed by
    ``id_col``). The index config must match the index (persist both
    via ``sources.artifacts.save_minhash_doc_index``).

    Same ``foreachBatch`` architecture as the fuzzy guard: each
    micro-batch runs the exact BATCH kernel
    (``minhash_band_probe_verified``), so streaming decisions are
    identical by construction to the batch cross-corpus
    ``minhash_lsh_join`` at the same config and threshold.

    ``bounded_batch`` (default True — micro-batches are bounded by
    definition) broadcasts the batch's band rows so the corpus-scale
    index streams map-side with zero index exchanges; the downstream
    verify broadcast is additionally gated by the ACTUAL candidate
    count (a hot bucket can inflate candidates past what the batch
    size implies). Set False for unbounded-trigger sources.
    """
    from data_engineering_capstone_project__spark.operators.dedup import (
        minhash_band_probe_verified,
    )

    spark = stream.sparkSession
    acc: list[DataFrame] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = minhash_band_probe_verified(
            batch_df,
            doc_index,
            corpus,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold,
            keep=keep,
            bounded_batch=bounded_batch,
        )
        if sink_path is not None:
            routed.write.mode("append").parquet(sink_path)
        else:
            acc.append(routed.persist())
            acc[-1].count()

    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if sink_path is not None:
        return spark.read.parquet(sink_path)
    out = spark.createDataFrame([], stream.schema)
    for part in acc:
        out = out.unionByName(part)
    return out


def dsir_score_stream(
    stream: DataFrame,
    ratio: DataFrame,
    n_buckets: int,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    sink_path: str | None = None,
) -> DataFrame:
    """Score an arriving document stream against a FITTED DSIR model
    (the ``(bucket, _lr)`` table, typically reloaded via
    ``sources.artifacts.load_dsir_model`` — which also returns the
    ``n_buckets``/``salt`` the stream side MUST reuse): per micro-batch,
    the exact batch kernel (``text.dsir_score`` — featurize, broadcast
    ratio join, per-doc sum) runs inside ``foreachBatch``, so streaming
    scores are identical by construction to a batch scoring pass. The
    model never refits per batch — this is the steady-state data
    selection shape (score at ingest, select downstream).

    Emits ``(id, n_grams, logw)`` per scored document. Synchronous
    driver for bounded sources/tests; ``sink_path`` appends parquet.
    """
    from data_engineering_capstone_project__spark.operators.text import (
        dsir_score,
    )

    spark = stream.sparkSession
    acc: list[DataFrame] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = dsir_score(
            batch_df, ratio, id_col, text_col, n_buckets, salt
        )
        if sink_path is not None:
            scored.write.mode("append").parquet(sink_path)
        else:
            acc.append(scored.persist())
            acc[-1].count()

    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if sink_path is not None:
        return spark.read.parquet(sink_path)
    if not acc:
        # empty stream: the id field's TYPE comes from the stream schema
        # (string ids would otherwise yield a union-incompatible frame)
        id_type = stream.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{id_col} {id_type}, n_grams bigint, logw double"
        )
    out = acc[0]
    for part in acc[1:]:
        out = out.unionByName(part)
    return out


def stateful_running_count(
    stream: DataFrame,
    key_col: str = "user_id",
    out_schema: str = "user_id long, n_events long",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-key event count across micro-batches (the canonical shape for
    custom streaming state — replace the update body for richer state)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_left: str,
    ts_right: str,
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with the time-range bound
    ``left.ts <= right.ts <= left.ts + within``.

    Both sides carry watermarks so the state store can evict rows once
    they can no longer match (state is bounded by watermark + within —
    the property that makes stream-stream joins feasible on unbounded
    input). Column names must be disjoint apart from ``key``; rename
    before calling.
    """
    l = left.withWatermark(ts_left, watermark)
    r = right.withWatermark(ts_right, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(ts_right) >= F.col(ts_left))
        & (F.col(ts_right) <= F.col(ts_left) + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def asof_enrich_stream(
    stream: DataFrame,
    features: DataFrame,
    ts_col: str = "ts",
    by=("user_id",),
    right_value_cols=None,
    direction: str = "backward",
    suffix: str = "_r",
    sink_path: str | None = None,
) -> DataFrame:
    """Stream-static AS-OF enrichment (VERDICT r10 #5) — the
    feature-store standard "latest feature value as of event time":
    every arriving micro-batch left-asof-joins a STATIC feature table
    with the exact batch kernel (``operators.asof.asof_join`` — tagged
    union + one running ignorenulls window per key), inside
    ``foreachBatch``. Enrichment is per-ROW (each left row's match
    depends only on the feature table, never on other stream rows), so
    the output is independent of micro-batch boundaries and identical
    by construction to a single batch ``asof_join`` over the same
    arrivals — the gate ``x_stream_asof`` pins that equivalence against
    the same DuckDB ``ASOF JOIN`` oracle as the batch operator.

    ``features`` is pinned at stream start — pass a versioned snapshot
    (``sources.io.read_versioned``) for a reproducible run; re-launch
    the stream to pick up a newer feature publication (mid-run feature
    mutation would make replayed micro-batches non-deterministic,
    which is exactly what the versioned store exists to prevent).

    Synchronous driver for bounded sources/tests; ``sink_path``
    appends parquet for the unbounded form. At 100 TB-scale feature
    tables the per-batch union-window plan shuffles features once per
    micro-batch — snapshot-join semantics worth it for correctness;
    bucket the feature table by the key to keep that exchange local.
    """
    from data_engineering_capstone_project__spark.operators.asof import (
        asof_join,
    )

    spark = stream.sparkSession

    def enrich(df: DataFrame) -> DataFrame:
        return asof_join(
            df,
            features,
            ts_col=ts_col,
            by=list(by),
            right_value_cols=right_value_cols,
            direction=direction,
            suffix=suffix,
        )

    acc: list[DataFrame] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = enrich(batch_df)
        if sink_path is not None:
            out.write.mode("append").parquet(sink_path)
        else:
            acc.append(out.persist())
            acc[-1].count()

    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if sink_path is not None:
        return spark.read.parquet(sink_path)
    if not acc:
        # empty stream: derive the enriched schema from an empty batch
        return enrich(spark.createDataFrame([], stream.schema))
    out = acc[0]
    for part in acc[1:]:
        out = out.unionByName(part)
    return out


def run_stream_incremental_upsert(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
) -> None:
    """Incremental MERGE sink: each micro-batch upserts into a parquet
    target via foreachBatch (the lakehouse pattern — with Delta/Iceberg
    the body becomes a transactional MERGE INTO; parquet rewrite here
    demonstrates the same dataflow on the formats in this container).

    Synchronous: drives the (bounded) stream to completion.
    """
    from data_engineering_capstone_project__spark.operators.relational import upsert

    spark = stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            base = spark.read.parquet(target_path)
        except Exception:  # first batch: no target yet
            batch_df.write.mode("overwrite").parquet(target_path)
            return
        merged = upsert(base, batch_df, keys=keys)
        # stage BEFORE overwriting the files being read (never collect —
        # the merged table is corpus-sized); with a table format this
        # write-swap is a transactional MERGE instead
        stage = f"{target_path}__stage"
        merged.write.mode("overwrite").parquet(stage)
        spark.read.parquet(stage).write.mode("overwrite").parquet(target_path)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)

    q = stream.writeStream.foreachBatch(apply_batch).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
