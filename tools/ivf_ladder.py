"""Measure the r13 ANN-maintenance scale claims (VERDICT r12 #1/#5) on
a synthetic ladder: a FIXED-size batch ticked against an IVF-enabled
ingest root whose bootstrap corpus grows 10× per rung.

Claims under test:

1. **O(batch) vector maintenance**: the tick's IVF delta append (cell
   assignment + per-cell stats + fenced write) costs the batch, never
   the corpus — tick time should stay ~flat across rungs.
2. **Meta-fold drift trigger is scan-free**: evaluating
   ``ivf_needs_refit`` from the folded per-version metas
   (``load_ivf_log_stats`` + ``fold_ivf_cell_stats``) should cost
   milliseconds and stay flat, while the audited full-pass
   ``ivf_drift_stats`` grows ~linearly with the corpus — the gap is
   exactly what r13 moved out of the tick.
3. **Refit is O(corpus)** — which is why the tick only RAISES the
   trigger and ``refit_ivf_index`` runs operator-paced.
4. **Retirement refold is O(index log), not O(corpus)** (VERDICT r13
   #5): ``retire_docs`` of a FIXED 200-doc retirement set
   exclusion-folds the BM25 posting log and the IVF vector log (one
   broadcast anti-join each, scalars re-derived) — it grows with the
   LOG being folded, never re-tokenizes or re-encodes the corpus (the
   r13 shape did, and it was the most expensive job in the system).

Embeddings are hash-derived from doc_id (deterministic, 64-dim);
maintenance cost depends on row count × dimensionality, not content.

Usage: python tools/ivf_ladder.py [rung ...]   (default 5000 50000 500000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project__spark.operators import (  # noqa: E402
    similarity as sim,
)
from data_engineering_capstone_project__spark.plans import ingest  # noqa: E402
from data_engineering_capstone_project__spark.session import get_spark  # noqa: E402
from data_engineering_capstone_project__spark.sources import (  # noqa: E402
    artifacts as art,
)

RUNGS = ["5000", "50000", "500000"]
BATCH_DOCS = 2000  # fixed-size batch at every rung
DIM = 64


def synth(spark, lo: int, hi: int):
    """doc_id in [lo, hi) with a unique text and a 64-dim hash-derived
    embedding — written to parquet first so every measured phase reads
    a real scan, not an in-memory range."""
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("ladder document body "),
                F.col("id"),
                F.lit(" with distinct filler "),
                F.sha2(F.col("id").cast("string"), 256),
            ).alias("text"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)).cast(
                        "double"
                    )
                    / 500.0
                    - 1.0
                ),
            ).alias("embedding"),
        )
    )


def main() -> None:
    rungs = sys.argv[1:] or RUNGS
    spark = get_spark(
        app_name="ivf_ladder", master="local[32]", shuffle_partitions=32
    )
    print(
        f"{'rung':>8} {'tick_s':>8} {'trigger_ms':>11} "
        f"{'fullpass_s':>11} {'refit_s':>8} {'retire_s':>8}"
    )
    for rung in rungs:
        n = int(rung)
        base = tempfile.mkdtemp(prefix=f"ivfl_{rung}_")
        cpath, bpath = f"{base}/corpus", f"{base}/batch"
        synth(spark, BATCH_DOCS, n + BATCH_DOCS).write.parquet(cpath)
        synth(spark, 0, BATCH_DOCS).write.parquet(bpath)
        corpus = spark.read.parquet(cpath)
        batch = spark.read.parquet(bpath)
        root = f"{base}/r"
        ingest.init_ingest_indexes(
            spark, corpus, root, bm25_index=True,
            ivf_index={"vec_col": "embedding", "n_centroids": 16},
        )

        t0 = time.time()
        pub, st = ingest.ingest_batch(spark, batch, root)
        tick_s = time.time() - t0
        pub.unpersist()
        assert st.ivf_index_version is not None

        # trigger alone: meta fold, zero scans
        t0 = time.time()
        meta, _ = art.load_ivf_log_stats(f"{root}/ivf")
        cents, cbm = art.load_centroids_by_digest(
            spark, f"{root}/ivf_codebook", meta["codebook_digest"]
        )
        stats = sim.fold_ivf_cell_stats(meta["cell_totals"], int(cbm["k"]))
        sim.ivf_needs_refit(stats, cbm.get("fit_stats"))
        trigger_ms = (time.time() - t0) * 1000

        # audited full pass (what the pre-r13 shape paid per check)
        vecs, _ = art.load_ivf_log(spark, f"{root}/ivf")
        t0 = time.time()
        sim.ivf_drift_stats(vecs, cents)
        fullpass_s = time.time() - t0

        t0 = time.time()
        ingest.refit_ivf_index(spark, root)
        refit_s = time.time() - t0

        # reconciliation-sized retirement: exclusion-fold both search
        # logs (r14 bounded refold — VERDICT r13 #5)
        t0 = time.time()
        ingest.retire_docs(spark, root, list(range(2000, 2200)))
        retire_s = time.time() - t0

        print(
            f"{rung:>8} {tick_s:>8.2f} {trigger_ms:>11.1f} "
            f"{fullpass_s:>11.2f} {refit_s:>8.2f} {retire_s:>8.2f}"
        )


if __name__ == "__main__":
    main()
