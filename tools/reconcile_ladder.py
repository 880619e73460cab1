"""Measure the r14 cross-shard reconciliation paths on a synthetic
ladder: a sharded root with planted cross-shard near-dups (1% of the
corpus re-arrives under fresh ids with a one-token mutation), corpus
growing 5× per rung, reconciled once per path on twin roots.

Claims under test:

1. **Driver path** (default): the banded pass is O(union) and the
   adjudication is pair-sized — seconds should track the union scan,
   with the pair collect a small constant.
2. **Distributed path** (``distributed=True`` — the over-cap
   auto-escalation target, VERDICT r13 #4): same banded pass plus one
   anti-join per arrival round (two rounds here) — the per-rung DELTA
   vs the driver path is the price of never collecting a pair, which
   is what an over-cap corpus pays instead of raising.
3. Both paths retire the SAME count (parity is unit/fuzz-pinned
   elsewhere; the ladder re-checks the counts as a cheap invariant).
4. **Band-log candidate pass** (r15, VERDICT r14 #1): on VERIFIED
   roots the candidate relation self-joins the persisted per-shard
   (band, bucket, corpus_id) logs — O(index log) — instead of
   re-shingling + re-MinHashing the union's text; the verified-log
   vs verified-recompute arm pair measures exactly that delta, with
   identical retirements as the invariant.

Usage: python tools/reconcile_ladder.py [rung ...]  (default 20000 100000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project__spark.plans import (  # noqa: E402
    ingest,
    shards,
)
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402

RUNGS = ["20000", "100000"]


def synth(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("ladder reconciliation document body "),
            F.col("id"),
            F.lit(" with distinct filler tokens "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )


def main() -> None:
    rungs = sys.argv[1:] or RUNGS
    spark = get_spark(
        app_name="reconcile_ladder", master="local[32]",
        shuffle_partitions=32,
    )
    print(
        f"{'rung':>8} {'arm->path':>22} {'n_pairs':>9} {'n_retired':>10} "
        f"{'reconcile_s':>12}"
    )
    for rung in rungs:
        n = int(rung)
        base = tempfile.mkdtemp(prefix=f"recl_{rung}_")
        cpath, bpath = f"{base}/corpus", f"{base}/batch"
        synth(spark, 0, n).write.parquet(cpath)
        corpus = spark.read.parquet(cpath)
        # batch: fresh docs + 1% planted near-dups of corpus content
        fresh = synth(spark, n, n + n // 10)
        planted = corpus.filter(F.col("doc_id") % 100 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qz")).alias("text"),
        )
        fresh.unionByName(planted).write.parquet(bpath)
        batch = spark.read.parquet(bpath)

        rows = []
        arms = (
            ("default", None, {}),
            ("distributed", True, {}),
            ("ver-log", None, {"verified": True}),
            ("ver-recompute", None, {"verified": True,
                                     "use_band_logs": False}),
        )
        for arm, dist, opts in arms:
            root = f"{base}/{arm}/r"
            init_kw = (
                {"verify_jaccard_threshold": 0.8}
                if opts.get("verified")
                else {}
            )
            shards.init_sharded_ingest(
                spark, corpus, root, n_shards=2, **init_kw
            )
            shards.ingest_batch_sharded(spark, batch, root)
            t0 = time.time()
            st = shards.reconcile_sharded_near_dups(
                spark, root, distributed=dist,
                use_band_logs=opts.get("use_band_logs"),
            )
            secs = time.time() - t0
            # the default arm REPORTS the path it actually took — an
            # over-cap rung auto-escalates to distributed by design
            # (VERDICT r13 #4), which is itself a ladder observation
            label = f"{arm}->{st['path']}"
            rows.append((arm, label, st["n_pairs"], st["n_retired"], secs))
            print(
                f"{rung:>8} {label:>22} {st['n_pairs']:>9} "
                f"{st['n_retired']:>10} {secs:>12.2f}"
            )
        by_arm = {r[0]: r for r in rows}
        assert (
            by_arm["default"][3] == by_arm["distributed"][3]
        ), "unverified arm retirement counts diverged"
        assert (
            by_arm["ver-log"][3] == by_arm["ver-recompute"][3]
        ), "verified arm retirement counts diverged"

    # ---- candidate-pass microbench (VERDICT r14 #1) ----------------
    # The arms above measure END-TO-END reconcile on short template
    # text, where retirement dominates and re-MinHashing is
    # artificially cheap. The claim under test — candidate generation
    # O(index log), not O(union text) — needs documents whose TEXT is
    # expensive to re-shingle and a CLEAN corpus (no planted dups), so
    # reconcile_s ≈ the candidate pass + an empty verify. ~1.3 KB docs
    # (LLM-pipeline scale is KBs-to-MBs; the gap grows with length).
    print(
        f"\n{'rung':>8} {'candidate arm':>18} {'n_pairs':>9} "
        f"{'reconcile_s':>12}   (clean corpus, ~1.3KB docs)"
    )
    for rung in rungs:
        n = int(rung)
        base = tempfile.mkdtemp(prefix=f"reclc_{rung}_")
        cpath = f"{base}/corpus"
        spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("candidate ladder long document body "),
                F.col("id").cast("string"),
                F.lit(" "),
                # 20 distinct 64-char blocks -> ~1.3 KB of unique text
                *[
                    F.sha2(
                        F.concat(
                            F.col("id").cast("string"), F.lit(str(i))
                        ),
                        256,
                    )
                    for i in range(20)
                ],
            ).alias("text"),
        ).write.parquet(cpath)
        corpus = spark.read.parquet(cpath)
        for arm, ubl in (("ver-log", None), ("ver-recompute", False)):
            root = f"{base}/{arm}/r"
            shards.init_sharded_ingest(
                spark, corpus, root, n_shards=2,
                verify_jaccard_threshold=0.8,
            )
            t0 = time.time()
            st = shards.reconcile_sharded_near_dups(
                spark, root, use_band_logs=ubl
            )
            secs = time.time() - t0
            assert st["n_retired"] == 0, "clean corpus retired docs"
            print(
                f"{rung:>8} {arm:>18} {st['n_pairs']:>9} {secs:>12.2f}"
            )


if __name__ == "__main__":
    main()
