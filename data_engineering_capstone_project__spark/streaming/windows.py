"""Event-time windowing & sessionization (SURVEY.md §2.9).

The reference has no streaming surface; the engine provides a batch-first
event-time layer (oracle-checkable in DuckDB) whose expressions are
identical under Structured Streaming — the same ``F.window`` aggregation
works on a ``readStream`` DataFrame with a watermark (see
``streaming.stream``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling event-time window aggregation.

    ``window(ts, duration)`` buckets by floor(ts/duration) — the same
    semantics as DuckDB ``time_bucket``. Output carries ``window_start``/
    ``window_end`` as flat columns.
    """
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding (hopping) window aggregation — each event lands in
    duration/slide overlapping windows."""
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win.alias("w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization via window-function gap analysis.

    lag(ts) per user → new-session flag when gap exceeded → running sum =
    per-user session index. Shuffles once on ``user_col`` (both window
    specs share the partitioning, so Catalyst plans a single exchange).
    At 100 TB the per-user partition is tiny — no skew concern unless one
    user dominates; AQE skew handling covers that.
    """
    gap_seconds = _interval_seconds(gap)
    w = W.partitionBy(user_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        F.when(prev_ts.isNull(), 1)
        .when(
            F.col(ts_col).cast("double") - prev_ts.cast("double") > gap_seconds, 1
        )
        .otherwise(0)
    )
    running = F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        df.withColumn("_new", new_session)
        .withColumn(session_col, running.cast("long"))
        .drop("_new")
    )


def _interval_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return float(qty) * mult


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each step
    completed strictly after the previous step (NULL once the chain
    breaks).

    One aggregated frame per step (events collapse to 1 row/user BEFORE
    any join) chained by ``user_col`` — every join reuses the same hash
    partitioning, so the whole funnel is one shuffle of each step's
    (already aggregated) frame, never of raw events.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        prev = f"step{i - 1}_ts"
        out = (
            out.join(
                nxt,
                (out[user_col] == nxt["_u"]) & (nxt["_t"] > out[prev]),
                "left",
            )
            .groupBy(*[F.col(c) for c in out.columns])
            .agg(F.min("_t").alias(f"step{i}_ts"))
        )
    return out
