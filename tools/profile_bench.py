"""Per-query bench profiler (guide §1: measure first).

For every headline query, times the bench's measurement region split into
its two phases — ``fn(spark, sf_dir)`` (query construction, which for
several entries runs driver-side jobs: digest scans, approxQuantile,
collects) and the noop write (the timed action) — and counts the Spark
jobs each phase launched via the status tracker under a per-query job
group. The job count is the fixed-overhead proxy that dominates at small
SF and becomes scheduler round-trips at cluster scale.

Usage: python tools/profile_bench.py [query ...] [--runs N] [--json OUT]
Defaults to the full headline set, 3 runs, median of runs 2..n.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from data_engineering_capstone_project__spark.session import get_spark


def main() -> int:
    argv = list(sys.argv[1:])
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        del argv[i : i + 2]
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv or (
        bench.HEADLINE + bench.HEADLINE_R6 + bench.HEADLINE_R7 + bench.HEADLINE_R12
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_bench")
    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup identical to bench.py
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    from data_engineering_capstone_project__spark.sources.io import load_events

    load_events(spark, sf_dir).limit(1).count()
    qs["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for r in range(runs):
            gid = f"prof_{name}_{r}"
            sc.setJobGroup(gid, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            jobs_build = len(tracker.getJobIdsForGroup(gid))
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            jobs_total = len(tracker.getJobIdsForGroup(gid))
            sc.setJobGroup("idle", "idle")
            samples.append(
                {
                    "build_s": t1 - t0,
                    "noop_s": t2 - t1,
                    "total_s": t2 - t0,
                    "jobs_build": jobs_build,
                    "jobs_noop": jobs_total - jobs_build,
                }
            )
        steady = sorted(samples[1:], key=lambda s: s["total_s"]) or samples
        # lower-middle for even-length lists: with the default 3 runs
        # the upper-middle would report the SLOWEST steady sample
        med = steady[(len(steady) - 1) // 2]
        results[name] = {
            "build_s": round(med["build_s"], 3),
            "noop_s": round(med["noop_s"], 3),
            "total_s": round(med["total_s"], 3),
            "jobs_build": med["jobs_build"],
            "jobs_noop": med["jobs_noop"],
            "run1_total_s": round(samples[0]["total_s"], 3),
        }
        print(
            f"{name:32s} total={med['total_s']:7.3f}s "
            f"build={med['build_s']:7.3f}s ({med['jobs_build']:2d} jobs) "
            f"noop={med['noop_s']:7.3f}s ({med['jobs_noop']:2d} jobs)",
            flush=True,
        )
    total = sum(r["total_s"] for r in results.values())
    print(f"{'TOTAL':32s} total={total:7.3f}s")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
