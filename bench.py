"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is materialized with the no-op writer (full execution, no
collect-to-driver cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_engineering_capstone_project__spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "j4_linkage_join",
    "j1_dict_coalesce",
    "a4_group_aggs",
    "w1_row_number",
    "w2_window_funcs",
    "d_derived_measures",
    "x_text_stats",
    "x_exact_dedup",
    "x_window_tumbling",
    "x_sessionize",
    "x_json_extract",
    "x_ann_topk",
    "x_asof_join",
    "x_topk_per_group",
    "x_pivot",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q13_order_distribution",
    "x_tf_idf",
    "x_pack_sequences",
    "x_hash_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    # JVM/codegen warmup + file-footer caching: one trivial pass over the
    # main tables so per-query timings reflect steady-state execution
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    from data_engineering_capstone_project__spark.sources.io import load_events

    load_events(spark, sf_dir).limit(1).count()
    qs["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    retried: list[str] = []
    for name in HEADLINE:
        fn = qs[name]

        # run 1 pays codegen compile + JIT for the plan shape and is
        # DISCARDED; the reported number is the median of the remaining
        # runs (steady state), with min-max spread recorded so
        # round-over-round deltas can be read against run-to-run noise
        def measure() -> tuple[float, float]:
            samples: list[float] = []
            for _ in range(n_runs):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            steady = sorted(samples[1:]) if len(samples) > 1 else samples
            return steady[len(steady) // 2], steady[-1] - steady[0]

        med, spr = measure()
        # a spread above ~30% of the median means the machine was
        # contended mid-measurement (VERDICT r2: a committed bench must
        # be trustworthy) — remeasure up to twice, keep the calmest
        for _ in range(2):
            if med <= 0 or spr / med <= 0.30:
                break
            if name not in retried:
                retried.append(name)
            med2, spr2 = measure()
            if spr2 / max(med2, 1e-9) < spr / med:
                med, spr = med2, spr2
        timings[name] = round(med, 3)
        spreads[name] = round(spr, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "runs_per_query": n_runs,
                "aggregation": "median of runs 2..n (run 1 warms codegen)",
                "respread_queries": retried,
                "spread_policy": "remeasured (<=2x) when spread > 30% of median",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
