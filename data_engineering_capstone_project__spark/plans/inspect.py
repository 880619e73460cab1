"""Physical-plan introspection helpers for tests and correctness gates.

Plan SHAPE is part of this engine's contract (a filter that doesn't reach
``PartitionFilters`` silently scans 500× the bytes at 100 TB), so gates
assert it — these helpers centralize the py4j plumbing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The (initial) executed-plan string — pre-execution, so AQE
    re-optimizations are not reflected; fine for static properties like
    ``PartitionFilters`` / ``PushedFilters`` / scan ``ReadSchema``."""
    return df._jdf.queryExecution().executedPlan().toString()


def partition_filters(df: DataFrame) -> list[str]:
    """Every non-empty ``PartitionFilters: [...]`` bracket in the plan."""
    return [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[([^\]]+)\]", physical_plan(df))
        if m.group(1).strip()
    ]


def executed_scan_metrics(df: DataFrame) -> dict[str, int]:
    """EXECUTE ``df`` (a ``collect()`` — bounded results only: tests and
    gates) and return the file-scan runtime metrics summed over every
    scan node: ``numFiles`` / ``numPartitions`` (partitions LISTED after
    partition pruning) / ``numOutputRows`` etc. This is the ground truth
    for pruning claims — ``inputFiles()`` ignores filters, and the static
    plan only shows the filter's presence, not what the scan actually
    touched."""
    df.collect()
    totals: dict[str, int] = {}

    def walk(node, depth: int = 0) -> None:
        if depth > 50:
            return
        name = node.nodeName()
        if "Scan" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                key = kv._1()
                totals[key] = totals.get(key, 0) + int(kv._2().value())
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
        # AQE wraps materialized subtrees in QueryStageExec nodes whose
        # children() is empty — the real plan hangs off .plan(). A
        # ReusedExchange points BACK at an exchange counted elsewhere,
        # so it is deliberately NOT followed (it would double-count).
        if "QueryStage" in name:
            try:
                walk(node.plan(), depth + 1)
            except Exception:
                pass
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), depth + 1)

    walk(df._jdf.queryExecution().executedPlan())
    return totals
