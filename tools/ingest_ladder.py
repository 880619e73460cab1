"""Measure the two r12 scale claims (VERDICT r11 #1/#2) on the ladder
corpus (tools/gen_scale_data.py):

1. O(batch) index maintenance: one FIXED-size batch tick against a
   bm25-enabled ingest root, as the bootstrap corpus grows 10× per
   rung — tick time should stay ~flat (the per-tick work is the batch,
   never the corpus), while the pre-r12 alternative (from-scratch
   snapshot BM25 refit of the full corpus, what ANY corpus change
   forced) grows ~linearly.
2. Shard concurrency: the same two-shard batch ticked with parallel
   shard threads vs one-at-a-time — wall clock should drop (shards
   share nothing; the win is bounded by local-mode core sharing, the
   point is the trend and that parallel is never slower).

Usage: python tools/ingest_ladder.py [rung ...]   (default 5000 50000 500000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project__spark.operators import text  # noqa: E402
from data_engineering_capstone_project__spark.plans import ingest, shards  # noqa: E402
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402
from data_engineering_capstone_project__spark.sources import artifacts as art  # noqa: E402

RUNGS = ["5000", "50000", "500000"]
BATCH_DOCS = 2000  # fixed-size batch at every rung


def main() -> None:
    rungs = sys.argv[1:] or RUNGS
    spark = get_spark(
        app_name="ingest_ladder", master="local[32]", shuffle_partitions=32
    )
    print(
        f"{'rung':>8} {'tick_s':>8} {'delta_s':>8} {'refit_s':>8} "
        f"{'shard_par_s':>12} {'shard_ser_s':>12}"
    )
    rows = []
    for rung in rungs:
        src = f"/tmp/spark_graft_ladder/{rung}/documents.parquet"
        if not os.path.exists(src):
            continue
        d = spark.read.parquet(src).select("doc_id", "text")
        batch = d.filter(F.col("doc_id") < BATCH_DOCS)
        corpus = d.filter(F.col("doc_id") >= BATCH_DOCS)

        # 1a. fixed-size tick against a growing corpus (bm25-enabled)
        root = tempfile.mkdtemp(prefix=f"ingl_{rung}_") + "/r"
        ingest.init_ingest_indexes(spark, corpus, root, bm25_index=True)
        t0 = time.time()
        pub, _ = ingest.ingest_batch(spark, batch, root)
        pub.unpersist()
        tick_s = time.time() - t0

        # 1b. the BM25 maintenance cost ALONE for this corpus change:
        # the posting delta (pure function of the batch — flat by
        # construction) vs the pre-r12 from-scratch snapshot refit of
        # the WHOLE post-tick corpus (what any change forced)
        delta_path = tempfile.mkdtemp(prefix=f"delta_{rung}_") + "/idx"
        t0 = time.time()
        postings, pstats = text.bm25_postings_with_stats(batch)
        art.save_bm25_postings(
            postings, delta_path, stats=pstats,
            n_term_buckets=text._BM25_TERM_BUCKETS,
        )
        delta_s = time.time() - t0
        full = ingest.read_ingest_corpus(spark, root)
        refit_path = tempfile.mkdtemp(prefix=f"refit_{rung}_") + "/idx"
        t0 = time.time()
        art.save_bm25_index(
            text.bm25(full), refit_path, corpus_digest="ladder",
            n_term_buckets=text._BM25_TERM_BUCKETS,
        )
        refit_s = time.time() - t0

        # 2. two-shard tick: parallel vs serialized (same batch/corpus)
        r_par = tempfile.mkdtemp(prefix=f"shp_{rung}_") + "/r"
        r_ser = tempfile.mkdtemp(prefix=f"shs_{rung}_") + "/r"
        shards.init_sharded_ingest(spark, corpus, r_par, n_shards=2)
        shards.init_sharded_ingest(spark, corpus, r_ser, n_shards=2)
        t0 = time.time()
        shards.ingest_batch_sharded(spark, batch, r_par)
        par_s = time.time() - t0
        t0 = time.time()
        shards.ingest_batch_sharded(spark, batch, r_ser, max_parallel=1)
        ser_s = time.time() - t0

        rows.append((rung, tick_s, delta_s, refit_s, par_s, ser_s))
        print(
            f"{rung:>8} {tick_s:>8.2f} {delta_s:>8.2f} {refit_s:>8.2f} "
            f"{par_s:>12.2f} {ser_s:>12.2f}"
        )


if __name__ == "__main__":
    main()
