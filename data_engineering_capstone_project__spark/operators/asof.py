"""As-of and range joins (beyond-reference extension; SURVEY.md §2.3 J5
notes the reference has no temporal joins — these are standard analytics
engine surface that Spark lacks natively).

``asof_join`` is implemented the scale-friendly way: union both sides,
one shuffle on the partition key, and a running ``last(..., ignorenulls)``
window — O(n log n) within each key partition, no per-row probing, no
Python. (The ``applyInPandas``+``merge_asof`` alternative ships data
through Arrow; the union-window form stays in Tungsten.)

``range_join`` equi-joins on coarse buckets of the range key and
post-filters — turning an O(n·m) theta join into bucket-local work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    right_value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' = next
    ``right.ts >= left.ts``), matching on the ``by`` keys.

    Implementation: tag and union the two sides, then a single window per
    ``by`` key ordered by (ts, side) carrying the last-seen right values
    forward (``last(..., ignorenulls=True)``). One shuffle total; both
    sides stay columnar. Right rows sort before left rows at equal ts, so
    an exactly-simultaneous right row IS matched (merge_asof semantics).

    When several right rows share the same (by, ts) the winner is decided
    by a stable hash of the right value columns (backward: max hash;
    forward: min hash) — arbitrary but deterministic across runs and
    partitionings.
    """
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in by and c != ts_col
        ]
    lcols = [c for c in left.columns]

    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{ts_col}{suffix}"),
    )
    tagged_right = right.select(
        *[F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    # the right side's ts rides in ts_col for ordering purposes
    tagged_right = tagged_right.withColumn(ts_col, F.col(f"{ts_col}{suffix}"))

    unioned = tagged_left.unionByName(tagged_right).withColumn(
        "_tie", F.xxhash64(*[F.col(f"{c}{suffix}") for c in right_value_cols])
    )
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tie").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            "*",
            *[
                F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
                for c in [*right_value_cols, ts_col]
            ],
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_tie").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = unioned.select(
            "*",
            *[
                F.first(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
                for c in [*right_value_cols, ts_col]
            ],
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    out_cols = [F.col(c) for c in lcols]
    out_cols += [F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_value_cols]
    out_cols += [F.col(f"_f_{ts_col}").alias(f"{ts_col}{suffix}")]
    return filled.filter(F.col("_side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_keys: Sequence[tuple[str, str]] = (),
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``point_col`` ∈ [right.start, right.end).

    Each right interval explodes into ceil(len/width) coarse buckets; left
    points land in exactly one bucket → equi-join on (bucket, extra keys)
    then exact interval filter. Catalyst plans a plain shuffled hash/SMJ
    equi-join instead of a broadcast-nested-loop theta join.
    """
    bw = float(bucket_width)
    lb = F.floor(F.col(point_col) / bw)
    r_start_b = F.floor(F.col(start_col) / bw)
    r_end_b = F.floor(F.col(end_col) / bw)
    r = right.withColumn(
        "_bucket",
        F.explode(F.sequence(r_start_b.cast("long"), r_end_b.cast("long"))),
    )
    lft = left.withColumn("_bucket", lb.cast("long"))
    conds = [lft["_bucket"] == r["_bucket"]]
    conds += [lft[a] == r[b] for a, b in extra_keys]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    out = lft.join(r, cond, how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return out.drop("_bucket")
