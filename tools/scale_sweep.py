"""Generate SCALING.md: steady-state runtime of representative queries
across the three driver scale factors (100× data range), with the
per-query scaling exponent.

Run: ``python tools/scale_sweep.py``. A query whose time grows ~O(n)
shows exponent ≈ 1 across the 10× hops; sub-linear exponents mean fixed
overhead still dominates at these sizes (expected: sf0.1 is only ~600k
lineitem rows — the point is the TREND, not the absolute numbers).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from data_engineering_capstone_project__spark.session import get_spark

SFS = ["0.001", "0.01", "0.1"]
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "j4_linkage_join",
    "w1_row_number",
    "q13_order_distribution",
    "x_exact_dedup",
    "x_tf_idf",
    "x_text_stats",
    "x_pack_sequences",
    "x_unigram_logprob",
    "x_mix_sources",
    "x_embedding_near_dups",
    "x_ngram_jaccard",
]


LADDER_SFS = [
    ("5k", "/tmp/spark_graft_ladder/5000"),
    ("15k", "/tmp/spark_graft_ladder/15000"),
    ("50k", "/tmp/spark_graft_ladder/50000"),
]
# 100x decade — present when gen_scale_data.py ran with --big
if __import__("os").path.isdir("/tmp/spark_graft_ladder/500000"):
    LADDER_SFS.append(("500k", "/tmp/spark_graft_ladder/500000"))


def ladder_main(only: set[str] | None = None) -> None:
    """Dedup-ladder sweep across a 10× doc range (5k → 50k docs, all from
    tools/gen_scale_data.py — sparse-vocab corpus with planted dups; see
    that module for why the driver's tiny-vocab docs can't be scaled):
    wall time AND result counts per op, so superlinear candidate growth
    is visible even where constants hide runtime. ``only`` (CLI
    ``--ops a,b``) restricts to a subset and appends a dedicated
    section instead of the full table."""
    import os

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import (
        dedup,
        similarity,
    )

    if not os.path.isdir(LADDER_SFS[-1][1]):
        raise SystemExit(
            "generated sf1 data missing - run tools/gen_scale_data.py first"
        )
    spark = get_spark(app_name="ladder_sweep")

    def planted(e):
        base = e.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        dup = base.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
            ).alias("embedding"),
        )
        return base.unionByName(dup)

    def _kmeans_cell(d, e):
        from data_engineering_capstone_project__spark.operators.similarity import (
            kmeans_assign,
            kmeans_fit,
        )

        cents, _ = kmeans_fit(e, k=8, vec_col="embedding", n_iter=3, init_rounds=2)
        return kmeans_assign(e, cents).groupBy("cluster").count()

    def _pca_cell(d, e):
        comps, eig, mean = similarity.pca_fit(e, k=8, vec_col="embedding")
        # size filter forces the projection under the harness .count()
        # (the kernel runs regardless — mapInPandas can't be pruned into —
        # but keep the same honest-forcing shape as every other cell)
        return similarity.pca_transform(e, comps, mean).filter(
            F.size("pca") == 8
        )

    def _bpe_cell(d, e):
        from data_engineering_capstone_project__spark.operators import bpe

        merges = bpe.bpe_train(d, n_merges=30, min_freq=2)
        return d.sparkSession.createDataFrame(
            [(len(merges),)], "n_merges int"
        )

    def _dsir_cell(d, e):
        from data_engineering_capstone_project__spark.operators import (
            text as text_mod,
        )

        # target = 2% slice, raw = the rest; k fixed at 500 so the row
        # count is constant and runtime carries the whole signal (the
        # TakeOrdered limit cannot be satisfied without computing every
        # doc's key, so nothing is pruned)
        tgt = d.filter(F.col("doc_id") % 50 == 0)
        raw = d.filter(F.col("doc_id") % 50 != 0)
        return text_mod.dsir_resample(raw, tgt, k=500)

    def _ingest_defaults_cell(verify):
        # THE production entry at PURE DEFAULTS (VERDICT r7 #1): bootstrap
        # both dedup indexes over a 10% corpus slice (banding auto-sized
        # from the corpus count — no explicit num_hashes/bands anywhere),
        # then one full ingest tick over the other 90%. Before round 8
        # the defaults were the fixed 32/8 banding this ladder measured
        # going quadratic (18 s → 238 s over the 50k → 500k rung in
        # verified mode); this cell certifies the shipped defaults hold
        # ≲ linear. Cost includes the bootstrap index fits AND the tick's
        # artifact/publication parquet writes — the real loop, not just
        # the probe kernel.
        def cell(d, e):
            import shutil
            import tempfile

            from data_engineering_capstone_project__spark.plans import (
                ingest as ingest_mod,
            )

            corpus = d.filter(F.col("doc_id") % 10 == 0)
            batch = d.filter(F.col("doc_id") % 10 != 0)
            root = tempfile.mkdtemp(prefix="ladder_ingest_")
            try:
                ingest_mod.init_ingest_indexes(
                    d.sparkSession, corpus, root,
                    verify_jaccard_threshold=0.8 if verify else None,
                )
                surv, stats = ingest_mod.ingest_batch(
                    d.sparkSession, batch, root
                )
                surv.unpersist()
                # rows = published survivors (computed inside the tick)
                return d.sparkSession.range(stats.n_published)
            finally:
                shutil.rmtree(root, ignore_errors=True)

        return cell

    def _verified_probe_cell(d, e):
        # 10% of docs act as the static corpus; the index is (re)built
        # inside the cell (fit-once in production — both halves are
        # linear, so the combined cell must stay ≲ linear too).
        # Banding is auto-sized from N (the production guidance): the
        # DEFAULT 32/8 config was ladder-measured going quadratic in
        # candidate-verify volume at the 500k rung (238 s vs 18 s at
        # 50k — the fixed-banding hazard auto_minhash_config exists
        # for; baseline_j=0.07 is this corpus's measured baseline)
        corpus = d.filter(F.col("doc_id") % 10 == 0)
        batch = d.filter(F.col("doc_id") % 10 != 0)
        nh, nb = dedup.auto_minhash_config(
            d.count(), 0.8, baseline_j=0.07
        )
        idx = dedup.corpus_minhash_doc_index(
            corpus, num_hashes=nh, bands=nb
        )
        return dedup.minhash_band_probe_verified(
            batch, idx, corpus, num_hashes=nh, bands=nb
        )

    # (builder, measurement runs)
    OPS = {
        "exact_dedup": (lambda d, e: dedup.exact_dedup(d), 2),
        "minhash_lsh_pairs": (
            lambda d, e: dedup.minhash_lsh_pairs(d, jaccard_threshold=0.8),
            2,
        ),
        # DEFAULT config: minhash-prefiltered exact verify (r4 #3) — was
        # the ladder's long pole at 48 s single-run lossless; now cheap
        # enough for best-of-2 like everything else
        "ngram_jaccard_pairs": (
            lambda d, e: dedup.ngram_jaccard_pairs(d, threshold=0.8),
            2,
        ),
        "paragraph_dedup": (lambda d, e: dedup.paragraph_dedup(d), 2),
        # the length FILTER forces the span-removal computation under the
        # harness's .count(): a bare count lets Catalyst column-prune the
        # whole hash/cut pipeline (row count == doc count is derivable
        # without it), and a count over a grouping-free SUM aggregate is
        # pruned the same way (the aggregate provably returns 1 row, so
        # its expressions are dead) — both "measure" ~0.3 s of nothing.
        # A filter predicate on clean_text cannot be pruned, and the row
        # count stays the meaningful doc count.
        # rows fixed at k: runtime is the signal (see _dsir_cell)
        "dsir_resample": (_dsir_cell, 2),
        # signatures + index join + exact verify of colliding pairs —
        # rows = kept docs (planted near-dups of the corpus slice drop)
        "minhash_probe_verified": (_verified_probe_cell, 2),
        # full production tick at PURE defaults (auto banding) — the
        # r7 headline fix; candidate-level and verified tiers
        "ingest_tick_defaults": (_ingest_defaults_cell(False), 2),
        "ingest_tick_verified_defaults": (_ingest_defaults_cell(True), 2),
        "substring_span_dedup": (
            lambda d, e: dedup.substring_span_dedup(d).filter(
                F.length("clean_text") >= 0
            ),
            2,
        ),
        # DEFAULT config on purpose: this cell proves the auto-derived
        # (n_planes, n_tables) stays ~linear across the ladder (the
        # round-3 hazard was fixed n_planes=10 going ~N²/1024)
        "srp_lsh_pairs": (
            lambda d, e: similarity.lsh_bucket_pairs(planted(e), threshold=0.99),
            2,
        ),
        # full distributed fit: init + Lloyd are full-corpus passes, so
        # the cell certifies the per-pass cost is linear in vectors
        # (driver work is k x dim, corpus-independent)
        "kmeans_fit": (_kmeans_cell, 2),
        # corpus-sized cost is ONE word-count shuffle; the merge loop is
        # bounded by vocabulary, so the cell must flatline-then-linear
        "bpe_train": (_bpe_cell, 2),
        # fit = ONE sufficient-statistic pass (per-partition n/Σx/XᵀX,
        # driver eigh is dim³ — corpus-independent); transform = one
        # row-local matmul pass; the cell runs both
        "pca_fit_transform": (_pca_cell, 2),
    }
    if only:
        unknown = only - set(OPS)
        if unknown:
            raise SystemExit(f"--ops unknown: {sorted(unknown)}")
        OPS = {k: v for k, v in OPS.items() if k in only}
    results: dict[str, dict[str, tuple[float, int]]] = {
        op: {} for op in OPS
    }
    ndocs: dict[str, int] = {}
    for sf, sf_dir in LADDER_SFS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_docs = docs.count()
        ndocs[sf] = n_docs
        for op, (fn, n_runs) in OPS.items():
            best, rows = None, 0
            for _ in range(n_runs):
                t0 = time.time()
                rows = fn(docs, embs).count()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            # release operator-internal caches between cells so rungs
            # stay independent (within-cell warm policy unchanged —
            # CacheManager dedupes the identical plan across the 2 runs)
            from data_engineering_capstone_project__spark.cachereg import (
                release_intermediates,
            )

            release_intermediates()
            results[op][sf] = (best, rows)
            line = f"sf{sf} ({n_docs} docs) {op}: {best:.2f}s, {rows} rows"
            print(line, flush=True)
            # stream partial results — a killed run keeps its evidence
            with open("/tmp/ladder_cells.log", "a") as f:
                f.write(line + "\n")
    lines = [
        "",
        "## Dedup-ladder sweep (generated sparse corpus)"
        + (f" — subset {sorted(OPS)}" if only else ""),
        "",
        "Data: `tools/gen_scale_data.py` — driver-shaped documents over a",
        "5,000-word vocabulary with 2% planted exact + 2% near duplicates",
        "(the driver's own ~40-word-vocabulary corpus makes EVERY doc pair",
        "~0.4 Jaccard, so scaling it measures a data pathology — one giant",
        "near-dup cluster — instead of the operators; see the generator",
        "docstring). `exp` fits the log-log runtime slope over the 10× hop;",
        "rows make candidate growth visible even where constants hide",
        "runtime. All ladder ops must stay ≲ linear in docs (exp ≤ ~1;",
        "pair-emitting ops scale with planted-pair count, also linear).",
        "",
        "| op | "
        + " | ".join(f"{sf} s (rows)" for sf, _ in LADDER_SFS)
        + " | exp |",
        "|---|" + "---|" * (len(LADDER_SFS) + 1),
    ]
    first_sf, last_sf = LADDER_SFS[0][0], LADDER_SFS[-1][0]
    span = math.log(ndocs[last_sf] / ndocs[first_sf])
    for op, t in results.items():
        exp = (math.log(t[last_sf][0]) - math.log(t[first_sf][0])) / span
        cells = " | ".join(
            f"{t[sf][0]:.2f} ({t[sf][1]})" for sf, _ in LADDER_SFS
        )
        lines.append(f"| {op} | {cells} | {exp:.2f} |")
    lines.append("")
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print("appended ladder section to SCALING.md")


# Fresh-JVM child for the substring stability protocol: ONE cell per
# process so accumulated JVM/GC state can't bleed between runs (the r5
# observation: an identical plan's 500k wall time spanned 24–115 s
# within one long-lived JVM). The forcing aggregate hashes every cleaned
# byte (xxhash64 over clean_text, XOR-combined — order-independent, no
# ANSI sum overflow), so the run simultaneously proves the output
# byte-identical across runs.
_SUBSTRING_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from data_engineering_capstone_project__spark.session import get_spark
from data_engineering_capstone_project__spark.operators import dedup
from data_engineering_capstone_project__spark.cachereg import release_intermediates
spark = get_spark(app_name="substring_stability")
docs = spark.read.parquet(sys.argv[1] + "/documents.parquet")
# warm the ACTUAL text bytes outside the measured window — a bare
# count() satisfies itself from parquet footers and leaves the data
# pages cold, so run 1 after unrelated machine activity would measure
# disk, not the operator
docs.agg(F.sum(F.length("text"))).collect()


def cell():
    out = dedup.substring_span_dedup(docs)
    row = out.agg(
        F.count("*").alias("rows"),
        F.bit_xor(F.xxhash64("doc_id", "clean_text", "n_removed")).alias("ck"),
    ).collect()[0]
    release_intermediates()
    return row


# discarded warm-up execution: codegen/JIT compile, memory-pool sizing,
# and shuffle-dir setup all land here (bench.py's run-1 policy) — a
# GC-logged probe showed back-to-back steady-state runs within ~5%
# while JVM-cold first executions spanned 49-99 s
cell()
t0 = time.time()
row = cell()
el = time.time() - t0
print(json.dumps({"sec": round(el, 2), "rows": row["rows"],
                  "checksum": int(row["ck"])}))
spark.stop()
"""


def substring_stability_main(runs: int = 4) -> None:
    """Pinned measurement protocol for the 500k substring cell (VERDICT
    r5 next-round #5): ``runs`` consecutive FRESH-JVM single-cell runs.
    Each subprocess measures exactly one substring_span_dedup execution
    (scan pre-warmed) and reports (sec, rows, content checksum); the
    parent appends the table + the max/min spread to SCALING.md. A
    future regression is judged against THIS protocol's band, not the
    long-lived-JVM ladder cell whose 4× GC noise made regressions
    undetectable.

    Per-run records accumulate in ``/tmp/substring_stability.jsonl`` as
    they land, so a wall-clock-capped caller can split the protocol
    across invocations (``--runs N`` each) and the report covers every
    recorded run; delete the jsonl to start a fresh series."""
    import json
    import os
    import subprocess

    sf_dir = "/tmp/spark_graft_ladder/500000"
    log_path = "/tmp/substring_stability.jsonl"
    if not os.path.isdir(sf_dir):
        raise SystemExit("run tools/gen_scale_data.py --big first")
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    for i in range(runs):
        proc = subprocess.run(
            [sys.executable, "-c", _SUBSTRING_CHILD, sf_dir],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if proc.returncode != 0:
            raise SystemExit(f"child run {i} failed:\n{proc.stderr[-2000:]}")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"run {i + 1}/{runs}: {rec['sec']}s, {rec['rows']} rows, "
              f"checksum {rec['checksum']}", flush=True)
    with open(log_path) as f:
        results = [json.loads(line) for line in f if line.strip()]
    secs = sorted(r["sec"] for r in results)
    med = secs[len(secs) // 2]
    spread = (secs[-1] - secs[0]) / med if med else float("inf")
    identical = len({(r["rows"], r["checksum"]) for r in results}) == 1
    lines = [
        "",
        "## Substring 500k stability protocol (fresh-JVM steady-state runs)",
        "",
        "Each run is ONE steady-state `substring_span_dedup` execution in",
        "its OWN JVM: text bytes pre-read (a bare count() only touches",
        "parquet footers), one full warm-up execution discarded (codegen/",
        "JIT/memory-pool sizing — bench.py's run-1 policy), forcing",
        "aggregate hashes every cleaned byte. Diagnosis across the round-6",
        "series: identical plans, byte-identical outputs, ZERO Full GCs",
        "(-Xlog:gc probe), yet wall times still span up to ~2.8× — the",
        "residual variance is MACHINE-level (shared-host contention), not",
        "the operator. The regression metric is therefore the MINIMUM over",
        "the series: the floor is the operator's cost and is stable to a",
        "few percent run-to-run; everything above it is contention.",
        "",
        "| run | sec |",
        "|---|---|",
    ]
    for i, r in enumerate(results):
        lines.append(f"| {i + 1} | {r['sec']:.2f} |")
    lines += [
        "",
        f"floor (min) {secs[0]:.2f} s — the regression metric; median "
        f"{med:.2f} s; max-min spread {100 * spread:.0f}% of median "
        f"(machine noise band); output "
        f"{'byte-identical across runs' if identical else 'DIVERGED'} "
        f"(rows {results[0]['rows']}, xor-of-xxhash64 checksum "
        f"{results[0]['checksum']}).",
        "",
    ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print(f"floor {secs[0]:.2f}s, median {med:.2f}s, spread "
          f"{100 * spread:.0f}%, identical={identical}; appended to SCALING.md")


# Generic fresh-JVM floor child (VERDICT r6 next-round #3): ONE measured
# steady-state execution of a named ladder cell per process, so the floor
# series extends beyond substring to kmeans_fit and srp_lsh_pairs. Same
# protocol: data pages pre-warmed (footer-only count() is not a warm-up),
# one full warm-up execution discarded, forcing aggregate checksums the
# output so byte-divergence across runs is visible. Optional
# --memory-pressure mode runs the cell with the driver JVM HALVED (8g vs
# the 16g default) and an event log, and reports shuffle spill bytes —
# evidence that the operator degrades to spill, not OOM, under pressure
# (VERDICT r6 next-round #6).
_FLOOR_CHILD = r"""
import glob, json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

op = sys.argv[2]
pressure = len(sys.argv) > 3 and sys.argv[3] == "--memory-pressure"
extra = {}
evdir = None
if pressure:
    import os, tempfile
    evdir = tempfile.mkdtemp(prefix="spark_ev_")
    extra = {"spark.eventLog.enabled": "true",
             "spark.eventLog.dir": "file://" + evdir}
    os.environ["SPARK_DRIVER_MEMORY"] = "8g"  # halved vs engine default

from data_engineering_capstone_project__spark.session import get_spark
from data_engineering_capstone_project__spark.operators import dedup, similarity
from data_engineering_capstone_project__spark.cachereg import release_intermediates

spark = get_spark(app_name=f"floor_{op}", extra_conf=extra)
docs = spark.read.parquet(sys.argv[1] + "/documents.parquet")
embs = spark.read.parquet(sys.argv[1] + "/embeddings.parquet")
# warm the data pages of whichever table the cell scans
docs.agg(F.sum(F.length("text"))).collect()
embs.agg(F.sum(F.size("embedding"))).collect()


def planted(e):
    base = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    dup = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    return base.unionByName(dup)


def cell():
    if op == "substring":
        out = dedup.substring_span_dedup(docs)
        row = out.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("doc_id", "clean_text", "n_removed")).alias("ck"),
        ).collect()[0]
    elif op == "kmeans_fit":
        cents, _ = similarity.kmeans_fit(
            embs, k=8, vec_col="embedding", n_iter=3, init_rounds=2
        )
        out = similarity.kmeans_assign(embs, cents).groupBy("cluster").count()
        row = out.agg(
            F.sum("count").alias("rows"),
            F.bit_xor(F.xxhash64("cluster", "count")).alias("ck"),
        ).collect()[0]
    elif op == "srp_lsh_pairs":
        out = similarity.lsh_bucket_pairs(planted(embs), threshold=0.99)
        row = out.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("id_a", "id_b")).alias("ck"),
        ).collect()[0]
    elif op == "minhash":
        out = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.8)
        row = out.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("id_a", "id_b")).alias("ck"),
        ).collect()[0]
    elif op == "dsir":
        from data_engineering_capstone_project__spark.operators import text as text_mod
        out = text_mod.dsir_resample(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            k=500,
        )
        # checksum the SELECTION (ids + integer gram counts): the float
        # key sums in partition order and may wobble in the last ulp,
        # but a 1e-13 wobble cannot move a Gumbel-continuous top-k
        row = out.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("doc_id", "n_grams")).alias("ck"),
        ).collect()[0]
    else:
        raise SystemExit(f"unknown op {op}")
    release_intermediates()
    return {"rows": int(row["rows"]), "ck": int(row["ck"] or 0)}


cell()  # discarded warm-up: codegen/JIT/memory-pool sizing
t0 = time.time()
row = cell()
el = time.time() - t0
rec = {"op": op, "sec": round(el, 2), **row}
if evdir:
    spark.stop()  # flush the event log before parsing
    import os

    sm = sd = 0
    # Spark may write a single file OR a rolling eventlog_v2_* DIRECTORY
    # of events_* files — walk everything, skip markers/directories
    paths = []
    for root, _dirs, files in os.walk(evdir):
        paths += [os.path.join(root, f) for f in files]
    for p in paths:
        with open(p, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if not isinstance(ev, dict):
                    continue  # rolling-log marker lines parse as scalars
                if ev.get("Event") == "SparkListenerTaskEnd":
                    tm = ev.get("Task Metrics") or {}
                    sm += tm.get("Memory Bytes Spilled", 0)
                    sd += tm.get("Disk Bytes Spilled", 0)
    rec["spill_mem_mb"] = round(sm / 2**20, 1)
    rec["spill_disk_mb"] = round(sd / 2**20, 1)
    rec["driver_memory"] = "8g"
print(json.dumps(rec))
"""

FLOOR_OPS = ("substring", "kmeans_fit", "srp_lsh_pairs", "minhash", "dsir")


def floor_main(op: str, runs: int = 4, pressure: bool = False) -> None:
    """Fresh-JVM floor series for a named 500k ladder cell (generalizing
    the substring stability protocol — VERDICT r6 #3), or a single
    memory-pressure run (#6). Appends a SCALING.md section; per-run
    records accumulate in /tmp/floor_<op>[_pressure].jsonl so the series
    can be split across invocations."""
    import json
    import os
    import subprocess

    if op not in FLOOR_OPS:
        raise SystemExit(f"--floor op must be one of {FLOOR_OPS}")
    sf_dir = "/tmp/spark_graft_ladder/500000"
    if not os.path.isdir(sf_dir):
        raise SystemExit("run tools/gen_scale_data.py --big first")
    tag = f"{op}_pressure" if pressure else op
    log_path = f"/tmp/floor_{tag}.jsonl"
    args = [sys.executable, "-c", _FLOOR_CHILD, sf_dir, op]
    if pressure:
        args.append("--memory-pressure")
        runs = min(runs, 1) or 1
    for i in range(runs):
        proc = subprocess.run(
            args, capture_output=True, text=True, timeout=2400
        )
        if proc.returncode != 0:
            raise SystemExit(f"child run {i} failed:\n{proc.stderr[-2000:]}")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"run {i + 1}/{runs}: {rec}", flush=True)
    with open(log_path) as f:
        results = [json.loads(line) for line in f if line.strip()]
    secs = sorted(r["sec"] for r in results)
    med = secs[len(secs) // 2]
    spread = (secs[-1] - secs[0]) / med if med else float("inf")
    identical = len({(r["rows"], r["ck"]) for r in results}) == 1
    title = (
        f"## {op} 500k memory-pressure run (driver heap halved to 8g)"
        if pressure
        else f"## {op} 500k stability protocol (fresh-JVM steady-state runs)"
    )
    lines = ["", title, ""]
    if pressure:
        r = results[-1]
        lines += [
            "Same fresh-JVM steady-state protocol as the floor series, with",
            "`spark.driver.memory` HALVED (8g vs the engine's 16g default —",
            "local mode, so this is the whole JVM heap) and the event log on.",
            "The claim under test: the operator's shuffles degrade to SPILL,",
            "never OOM, and the output stays byte-identical to the",
            "unpressured floor series (VERDICT r6 #6).",
            "",
            "| sec | rows | checksum | shuffle spill (mem) | spill (disk) |",
            "|---|---|---|---|---|",
            f"| {r['sec']:.2f} | {r['rows']} | {r['ck']} "
            f"| {r['spill_mem_mb']} MB | {r['spill_disk_mb']} MB |",
            "",
            "Exit 0 (no OOM); spill figures include the discarded warm-up",
            "execution (the event log covers the whole JVM).",
            "",
        ]
    else:
        lines += [
            "Same pinned protocol as the substring series (data pages",
            "pre-warmed, one discarded warm-up execution, forcing aggregate",
            "checksums the output): the regression metric is the series",
            "FLOOR (min) — everything above it is shared-host contention",
            "(see the substring protocol's GC-probe diagnosis).",
            "",
            "| run | sec |",
            "|---|---|",
        ]
        for i, r in enumerate(results):
            lines.append(f"| {i + 1} | {r['sec']:.2f} |")
        lines += [
            "",
            f"floor (min) {secs[0]:.2f} s — the regression metric; median "
            f"{med:.2f} s; max-min spread {100 * spread:.0f}% of median "
            f"(machine noise band); output "
            f"{'identical across runs' if identical else 'DIVERGED'} "
            f"(rows {results[0]['rows']}, xor-of-xxhash64 checksum "
            f"{results[0]['ck']}).",
            "",
        ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print(f"appended {tag} section to SCALING.md")


def minhash_cap_main() -> None:
    """Measure auto_minhash_config RECALL past the hash cap (VERDICT r6
    #4): the config search steps its recall target down once no
    ≤max_hashes banding meets the candidate budget (≥ ~50M docs at the
    defaults). This protocol (a) prints the config ladder across N so the
    step-down point is explicit, and (b) applies the POST-CAP config (the
    one a 100M-doc corpus would get) to the 50k ladder corpus, where
    exact ground truth is computable, and reports DELIVERED recall vs the
    stepped target. Appends a SCALING.md section."""
    import json
    import os

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.operators import dedup

    sf_dir = "/tmp/spark_graft_ladder/50000"
    if not os.path.isdir(sf_dir):
        raise SystemExit("run tools/gen_scale_data.py first")
    t = 0.8
    ladder = []
    for n in (1e6, 1e7, 3e7, 5e7, 1e8, 1e9):
        nh, b = dedup.auto_minhash_config(int(n), t)
        r = nh // b
        # which recall target did the search settle on? replay the
        # step-down exactly as auto_minhash_config does
        import math

        target = None
        for rec in (0.99, 0.95, 0.9, 0.8, 0.5):
            pr = t**r
            need_b = max(
                1, math.ceil(math.log(max(1.0 - rec, 1e-12)) / math.log(1.0 - pr))
            )
            if need_b <= b:
                target = rec
                break
        ladder.append((int(n), nh, b, r, target))
        print(f"N={int(n):>12,}: num_hashes={nh}, bands={b}, r={r}, "
              f"recall_target={target}")
    # measure the FIRST post-cap rung (first target below 0.99) and the
    # SEVEREST one (the last ladder row — deepest step-down)
    post = next((row for row in ladder if row[4] and row[4] < 0.99), None)
    if post is None:
        raise SystemExit("no step-down found — widen the ladder")
    to_measure = [post]
    if ladder[-1][4] != post[4]:
        to_measure.append(ladder[-1])
    spark = get_spark(app_name="minhash_cap")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # exact ground truth: lossless AllPairs-prefiltered n-gram Jaccard
    truth = {
        (x["id_a"], x["id_b"])
        for x in dedup.ngram_jaccard_pairs(docs, threshold=t).collect()
    }
    measured = []
    for n_post, nh, b, r, target in to_measure:
        got = {
            (x["id_a"], x["id_b"])
            for x in dedup.minhash_lsh_pairs(
                docs, num_hashes=nh, bands=b, jaccard_threshold=t
            ).collect()
        }
        recall = len(got & truth) / len(truth) if truth else 1.0
        measured.append((n_post, nh, b, r, target, recall, len(got & truth)))
        print(
            f"config for N={n_post:,} (nh={nh} b={b} r={r}, stepped "
            f"target={target}): delivered recall on 50k planted corpus "
            f"= {recall:.4f} ({len(got & truth)}/{len(truth)} true pairs)"
        )
    lines = [
        "",
        "## auto_minhash_config past the hash cap (stepped-recall measurement)",
        "",
        "The config search caps signatures at max_hashes=256; when no",
        "banding under the cap meets the ~linear candidate budget it steps",
        "the recall TARGET down (0.99 → 0.95 → …) rather than go quietly",
        "quadratic. The step-down ladder, and the recall actually DELIVERED",
        "by the first and the severest post-cap configs, measured against",
        "exact lossless ground truth (`ngram_jaccard_pairs`) on the 50k",
        "planted ladder corpus (threshold 0.8):",
        "",
        "| N (docs) | num_hashes | bands | r | stepped target |",
        "|---|---|---|---|---|",
    ]
    for n, nh_, b_, r_, tg in ladder:
        lines.append(f"| {n:,} | {nh_} | {b_} | {r_} | {tg} |")
    lines.append("")
    for n_post, nh, b, r, target, recall, hits in measured:
        lines.append(
            f"- config for N={n_post:,} (nh={nh}, b={b}, r={r}; stepped "
            f"target {target}): delivered recall **{recall:.4f}** "
            f"({hits}/{len(truth)} true ≥0.8-Jaccard pairs)."
        )
    lines += [
        "",
        "The target is the recall at EXACTLY J = threshold; real near-dup",
        "pairs sit above the threshold where band-collision probability is",
        "higher, so delivered recall far exceeding the stepped target is",
        "the expected geometry — the step-down is a worst-case floor, not",
        "the operating recall.",
        "",
    ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    with open("/tmp/minhash_cap.json", "w") as f:
        json.dump({"ladder": ladder, "measured": measured}, f)
    print("appended minhash-cap section to SCALING.md")


R7_QUERIES = [
    "x_bm25_topk_indexed",
    "x_pca_persisted",
    "x_incremental_dedup_persisted",
    "x_ivf_pruned",
    "x_ivf_topk_many",
    "x_ivf_append",
    "x_stream_decontaminate_fuzzy",
    "x_snapshot_diff",
    "x_ingest_loop",
    "x_rrf_fusion",
    # session-2 additions
    "x_stream_decontaminate_verified",
    "x_dsir_select",
    "x_dsir_persisted",
    "x_freq_items",
]


def round7_main() -> None:
    """SF sweep for the round-7 operators (appends a SCALING.md section,
    same best-of-2 policy as the main table)."""
    spark = get_spark(app_name="r7_sweep")
    qs = entrymod.queries()
    times: dict[str, dict[str, float]] = {q: {} for q in R7_QUERIES}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in R7_QUERIES:
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[name][sf] = best
    lines = [
        "",
        "## Round-7 new operators (driver SFs, 100× range)",
        "",
        "Same policy as the main table (best of 2, steady state). The",
        "persisted-artifact gates include their digest check + reload on",
        "every call (the artifact already exists after run 1, so the fit",
        "never recurs); x_ivf_pruned / x_ivf_append / x_snapshot_diff",
        "rewrite their corpus/snapshot fixtures per call by design (the",
        "lifecycle IS the operator), so their constants include the",
        "write. Flat slopes at these sizes mean per-query constants",
        "dominate; the scale-relevant shapes are audited in EXPLAIN.md",
        "(partition-filter pruning, WindowGroupLimit, LeftAnti probes)",
        "and SCALE.md's shuffle-budget rows.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | exp |",
        "|---|---|---|---|---|",
    ]
    for name in R7_QUERIES:
        t = times[name]
        exp = (math.log(t["0.1"]) - math.log(t["0.001"])) / math.log(100)
        lines.append(
            f"| {name} | {t['0.001']:.2f} | {t['0.01']:.2f} | {t['0.1']:.2f} "
            f"| {exp:.2f} |"
        )
    lines.append("")
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print(f"appended round-7 section ({len(R7_QUERIES)} queries)")


def ingest_ticks_main(n_ticks: int = 20, compact_every: int | None = 10) -> None:
    """Many-tick ingest sweep (round 9): per-tick wall time over T
    sequential ticks, with the lifecycle compactor on a cadence —
    measured evidence that tick cost is FLAT in tick count under the
    single-scan publication-log read + append-log delta admission
    (the r8 per-tick unionByName fold and full-index rewrite both made
    later ticks strictly more expensive). Appends a SCALING.md section.
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_capstone_project__spark.plans import ingest
    from data_engineering_capstone_project__spark.sources import commitlog

    spark = get_spark(app_name="ingest_ticks")
    d = spark.read.parquet("/tmp/spark_graft_ladder/50000/documents.parquet")
    corpus = d.filter(F.col("doc_id") % (n_ticks + 1) == 0)
    root = tempfile.mkdtemp(prefix="ticks_sweep_")
    try:
        ingest.init_ingest_indexes(spark, corpus, root)
        per_tick: list[float] = []
        for t in range(1, n_ticks + 1):
            batch = d.filter(F.col("doc_id") % (n_ticks + 1) == t)
            t0 = time.time()
            surv, _ = ingest.ingest_batch(spark, batch, root)
            surv.unpersist()
            if compact_every is not None and t % compact_every == 0:
                ingest.compact_publication_log(spark, root, n_files=8)
            per_tick.append(time.time() - t0)
        n_vers = len(commitlog.committed_versions(os.path.join(root, "corpus")))
        total = ingest.read_ingest_corpus(spark, root).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    head = sum(per_tick[1:6]) / 5  # ticks 2-6 (tick 1 warms codegen)
    tail = sum(per_tick[-5:]) / 5  # last 5 ticks
    lines = [
        "",
        f"## Many-tick ingest sweep ({n_ticks} ticks, 50k-doc ladder corpus, "
        f"compact_every={compact_every})",
        "",
        "Per-tick wall time over sequential production ticks — the regime",
        "where the r8 defects compounded (T-way union re-analyzed per tick;",
        "full-index rewrite per tick). Flat tail/head ratio = tick cost is",
        "independent of how many ticks preceded it.",
        "",
        "| tick | s |",
        "|---|---|",
    ] + [f"| {i+1} | {s:.2f} |" for i, s in enumerate(per_tick)] + [
        "",
        f"head (mean ticks 2-6) {head:.2f} s; tail (mean last 5) {tail:.2f} s; "
        f"tail/head {tail / head:.2f}; corpus versions at end {n_vers} "
        f"(bounded by compaction); published total {total} rows.",
        "",
    ]
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print(f"appended many-tick section (tail/head {tail/head:.2f})")


def main() -> None:
    spark = get_spark(app_name="scale_sweep")
    qs = entrymod.queries()
    times: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in QUERIES:
            best = None
            for _ in range(2):  # steady-state (codegen/JIT amortized)
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[name][sf] = best
    lines = [
        "# SCALING — steady-state runtime vs scale factor (local[32])",
        "",
        "Generated by `python tools/scale_sweep.py` (best of 2 runs per",
        "cell). `exp` is the fitted log-log slope across the 100× range:",
        "≈0 = fixed overhead dominates, ≈1 = linear in data size. Values",
        "well below 1 at these sizes mean the cluster-relevant cost has",
        "not yet overtaken per-query constants — the shape to audit is",
        "that nothing grows FASTER than linearly.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | exp |",
        "|---|---|---|---|---|",
    ]
    for name in QUERIES:
        t = times[name]
        exp = (math.log(t["0.1"]) - math.log(t["0.001"])) / math.log(100)
        lines.append(
            f"| {name} | {t['0.001']:.2f} | {t['0.01']:.2f} | {t['0.1']:.2f} "
            f"| {exp:.2f} |"
        )
    lines.append("")
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote SCALING.md ({len(QUERIES)} queries x {len(SFS)} sfs)")


if __name__ == "__main__":
    if "--ladder" in sys.argv:
        _only = (
            set(sys.argv[sys.argv.index("--ops") + 1].split(","))
            if "--ops" in sys.argv
            else None
        )
        ladder_main(only=_only)
    elif "--substring-stability" in sys.argv:
        substring_stability_main()
    elif "--floor" in sys.argv:
        _op = sys.argv[sys.argv.index("--floor") + 1]
        _runs = (
            int(sys.argv[sys.argv.index("--runs") + 1])
            if "--runs" in sys.argv
            else 4
        )
        floor_main(_op, runs=_runs, pressure="--memory-pressure" in sys.argv)
    elif "--minhash-cap" in sys.argv:
        minhash_cap_main()
    elif "--round7" in sys.argv:
        round7_main()
    elif "--ingest-ticks" in sys.argv:
        ingest_ticks_main()
    else:
        main()
