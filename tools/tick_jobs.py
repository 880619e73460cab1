"""Count the Spark jobs one ingest tick launches (VERDICT r15 #4 "Done"
evidence: per-tick job count measurably down after the contract stats
started parsing their counts from the fencing digests).

Runs a bootstrap + ONE `ingest_batch` tick on a scratch root and prints
the tick's wall time and job count (status-tracker job group). Point it
at any repo checkout to A/B trees:

    python tools/tick_jobs.py [repo_root] [--bm25]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

repo = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/repo"
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project__spark.plans import ingest  # noqa: E402
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402


def main() -> int:
    bm25 = "--bm25" in sys.argv
    spark = get_spark(
        app_name="tick_jobs", master="local[8]", shuffle_partitions=8
    )
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = d.filter(F.col("doc_id") < 100)
    corpus = d.filter(F.col("doc_id") >= 100)
    root = tempfile.mkdtemp(prefix="tickjobs_") + "/r"
    ingest.init_ingest_indexes(spark, corpus, root, bm25_index=bm25)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm tick on a second root so codegen/session warm-up does not
    # inflate the measured tick
    root2 = tempfile.mkdtemp(prefix="tickjobs_warm_") + "/r"
    ingest.init_ingest_indexes(spark, corpus, root2, bm25_index=bm25)
    pub, _ = ingest.ingest_batch(spark, batch, root2)
    pub.unpersist()
    sc.setJobGroup("tick", "measured tick")
    t0 = time.time()
    pub, stats = ingest.ingest_batch(spark, batch, root)
    dt = time.time() - t0
    jobs = len(tracker.getJobIdsForGroup("tick"))
    sc.setJobGroup("idle", "idle")
    pub.unpersist()
    print(
        f"repo={repo} bm25={bm25} tick_jobs={jobs} tick_s={dt:.2f} "
        f"stats={stats}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
