"""Core-count scaling A/B on shuffle-heavy queries at a larger SF
(VERDICT r15 #5: sf0.1 is fixed-cost-bound, so the driver's 8c/32c
ratios cannot show shuffle-path scaling; this measures the same
queries on the 10×-replicated dataset from tools/gen_sf1.py).

Methodology identical to bench.py: noop sink, N runs (first discarded —
codegen warm-up), median of the steady runs. Honors $SPARK_GRAFT_CPUS
(pin the low-core arm with ``taskset`` too so the JVM cannot spill onto
idle cores):

    python tools/gen_sf1.py
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 SPARK_GRAFT_CPUS=32 \
        python tools/corescale_ab.py --json /tmp/ab32.json
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 SPARK_GRAFT_CPUS=8 \
        taskset -c 0-7 python tools/corescale_ab.py --json /tmp/ab8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_engineering_capstone_project__spark.session import get_spark

DEFAULT_QUERIES = [
    "q2_min_cost_supplier",
    "x_tf_idf",
    "x_bm25_topk",
    "x_dsir_select",
]


def main() -> int:
    argv = list(sys.argv[1:])
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        del argv[i : i + 2]
    runs = 4
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
    spark = get_spark(app_name="corescale_ab")
    qs = entrymod.queries()
    # warm-up identical in spirit to bench.py: footer caches + codegen
    for t in ("lineitem", "supplier", "part", "documents"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    results: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        steady = sorted(samples[1:]) if len(samples) > 1 else samples
        results[name] = round(steady[len(steady) // 2], 3)
        print(f"{name:28s} {results[name]:8.3f}s  (runs: "
              f"{[round(s, 3) for s in samples]})", flush=True)
    payload = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "runs": runs,
        "queries": results,
    }
    print(json.dumps(payload), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
