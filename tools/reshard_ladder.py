"""Measure the reshard quiesce window (VERDICT r14 #2): the r13 fix
made `reshard()` ACQUIRE every old shard's lease for its whole
duration — correctness landed, cost unmeasured. While the leases are
held, ingest is DOWN: the call re-routes the whole union, refits each
new shard's codebook, and rebuilds every per-shard index (fp, mh,
BM25 when present) from scratch. This ladder puts a number on that
window vs corpus size, with and without a BM25 posting log (the
heaviest rebuilt surface), so the snapshot-then-catchup decision is
measured, not guessed.

reshard_s IS the leases-held window: the lease acquisition is the
first thing the call does and release is in its finally.

Usage: python tools/reshard_ladder.py [rung ...]  (default 20000 100000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project__spark.plans import (  # noqa: E402
    shards,
)
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402

RUNGS = ["20000", "100000"]


def synth(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("ladder reshard document body "),
            F.col("id"),
            F.lit(" with distinct filler tokens "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )


def main() -> None:
    rungs = sys.argv[1:] or RUNGS
    spark = get_spark(
        app_name="reshard_ladder", master="local[32]",
        shuffle_partitions=32,
    )
    print(
        f"{'rung':>8} {'arm':>12} {'n_docs':>9} {'reshard_s':>10} "
        f"{'(leased_s = ingest-downtime window)'}"
    )
    for rung in rungs:
        n = int(rung)
        base = tempfile.mkdtemp(prefix=f"rshl_{rung}_")
        cpath = f"{base}/corpus"
        synth(spark, 0, n).write.parquet(cpath)
        corpus = spark.read.parquet(cpath)
        for arm, init_kw, ckw in (
            ("plain", {}, {}),
            ("bm25", {"bm25_index": True}, {}),
            ("bm25+catchup", {"bm25_index": True}, {"catchup": True}),
        ):
            root = f"{base}/{arm}/old"
            shards.init_sharded_ingest(
                spark, corpus, root, n_shards=2, **init_kw
            )
            t0 = time.time()
            res = shards.reshard(
                spark, root, f"{base}/{arm}/new", n_shards=4, **ckw
            )
            secs = time.time() - t0
            # plain reshard is leased wall-to-wall; catchup reports
            # its own (much smaller) leased window
            leased = res.get("leased_s", secs)
            print(
                f"{rung:>8} {arm:>12} {res['n_docs']:>9} {secs:>10.2f}"
                f"   leased_s={leased:.2f}"
            )


if __name__ == "__main__":
    main()
