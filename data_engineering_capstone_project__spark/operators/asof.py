"""As-of and range joins (beyond-reference extension; SURVEY.md §2.3 J5
notes the reference has no temporal joins — these are standard analytics
engine surface that Spark lacks natively).

``asof_join`` is implemented the scale-friendly way: union both sides,
one shuffle on the partition key, and a running ``last(..., ignorenulls)``
window — O(n log n) within each key partition, no per-row probing, no
Python. (The ``applyInPandas``+``merge_asof`` alternative ships data
through Arrow; the union-window form stays in Tungsten.)

With ``hot_key_threshold`` set, keys whose row count exceeds it take a
SKEW-SAFE two-phase path (VERDICT r9 #3): ``Window.partitionBy(*by)``
puts each key's FULL history in one task, so one instrument carrying
most of 100 TB of ticks would sort its entire history in a single task.
The hot path time-buckets inside the key, computes per-bucket seeds (the
last right value of every earlier bucket — a bounded per-key frame), and
runs the window per (key, bucket) — the same two-phase
bounded-driver-state shape ``add_row_id`` uses for W1.

``range_join`` equi-joins on coarse buckets of the range key and
post-filters — turning an O(n·m) theta join into bucket-local work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# broadcast ceilings for the hot path's census/seed frames, gated on the
# COUNTED hot-key cardinality (ADVICE r10): a census row is the by-keys +
# two doubles (~tens of bytes), a seed row is by-keys + bucket + carried
# values — 1M keys / 4M seed rows keep both well under a typical 8 GB
# driver/executor broadcast budget; past that AQE sizes the build side.
_HOT_BROADCAST_MAX_KEYS = 1_000_000
_HOT_BROADCAST_MAX_SEED_ROWS = 4_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    right_value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    hot_key_threshold: int | None = None,
    n_time_buckets: int = 256,
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

    **Skew safety** (``hot_key_threshold=N``): keys with more than N
    union rows are routed through a bucketed two-phase plan instead of
    one per-key window task. Phase 1 splits the hot key's time axis into
    ``n_time_buckets`` equal-width value buckets and aggregates, per
    (key, bucket) and per carried column, the LAST non-null right value
    in window order (``max_by`` over (ts, tie) — map-side combinable);
    a tiny per-key window over the ≤``n_time_buckets`` seed rows carries
    each bucket's predecessor state. Phase 2 runs the running-fill
    window partitioned by (key, bucket) — every sort group is now
    ~1/``n_time_buckets`` of the hot key — and coalesces with the seed.
    Row-identical to the plain plan by construction (bucket boundaries
    respect ts order, equal ts always share a bucket, null ts routes to
    bucket 0 — the nulls-first position the plain plan's sort gives it —
    and per-column ignorenulls semantics are preserved end-to-end;
    property-tested on planted 90%-one-key data with planted null ts).
    Cold keys keep the plain single-window plan. Cost when enabled: the
    map-combined per-key census is evaluated twice (once counted on the
    driver to size the plan, once in the tag join) — run
    ``skew_profile(df, by)`` first if you only suspect skew. A hot key
    whose ts values are ALL equal cannot be split (ties must sort in one
    group); such rows keep bucket 0. The census/seed frames are
    broadcast only when the counted hot-key cardinality proves them
    small; above the ceiling they join plain and AQE sizes the build
    side (an unconditional hint would recreate the memory hazard the
    hot path exists to avoid).

    Default (None) preserves the original single-window plan exactly.
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
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    carried = [*right_value_cols, ts_col]

    def window_fill(df: DataFrame, part_cols: list[str]) -> DataFrame:
        """The running per-column ignorenulls fill — over ``part_cols``
        (the plain per-key plan, or per (key, bucket) on the hot path)."""
        if direction == "backward":
            w = (
                Window.partitionBy(*part_cols)
                .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tie").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            fill = lambda c: F.last(f"{c}{suffix}", ignorenulls=True).over(w)  # noqa: E731
        else:
            w = (
                Window.partitionBy(*part_cols)
                .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_tie").asc())
                .rowsBetween(0, Window.unboundedFollowing)
            )
            fill = lambda c: F.first(f"{c}{suffix}", ignorenulls=True).over(w)  # noqa: E731
        return df.select("*", *[fill(c).alias(f"_f_{c}") for c in carried])

    out_cols = [F.col(c) for c in lcols]
    out_cols += [F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_value_cols]
    out_cols += [F.col(f"_f_{ts_col}").alias(f"{ts_col}{suffix}")]

    if hot_key_threshold is None:
        return window_fill(unioned, list(by)).filter(
            F.col("_side") == 1
        ).select(*out_cols)

    if hot_key_threshold < 1 or n_time_buckets < 2:
        raise ValueError(
            "asof_join: hot_key_threshold must be >= 1 and "
            f"n_time_buckets >= 2 (got {hot_key_threshold}, {n_time_buckets})"
        )
    # hot-key census: one map-combined count+min/max per key — tiny
    # output (one row per key over threshold; at most rows/threshold
    # keys can be hot). A key whose ts values are ALL null has a null
    # _tmin and is routed cold (the plain plan — ties can't be split
    # anyway); a hot key with SOME null ts keeps its non-null span and
    # its null-ts rows go to bucket 0 below.
    stats = (
        unioned.groupBy(*by)
        .agg(
            F.count("*").alias("_n"),
            F.min(F.col(ts_col).cast("double")).alias("_tmin"),
            F.max(F.col(ts_col).cast("double")).alias("_tmax"),
        )
        .filter(F.col("_n") > F.lit(int(hot_key_threshold)))
        .select(*by, "_tmin", "_tmax")
    )
    # count the census on the driver: 0 hot keys short-circuits to the
    # plain plan, and the count gates the broadcast hints below — at
    # hot_key_threshold≈1 the census is one row per DISTINCT key, so an
    # unconditional broadcast would be the very blowup this path avoids
    n_hot = stats.count()
    if n_hot == 0:
        return window_fill(unioned, list(by)).filter(
            F.col("_side") == 1
        ).select(*out_cols)
    stats_side = (
        F.broadcast(stats) if n_hot <= _HOT_BROADCAST_MAX_KEYS else stats
    )
    tagged = unioned.join(stats_side, list(by), "left_outer")
    cold = tagged.filter(F.col("_tmin").isNull()).drop("_tmin", "_tmax")
    cold_out = window_fill(cold, list(by)).filter(
        F.col("_side") == 1
    ).select(*out_cols)

    # equal-width value buckets over the key's ts span: order-preserving
    # (smaller ts ⇒ earlier-or-equal bucket; equal ts ⇒ same bucket), so
    # (bucket, in-bucket window order) == global window order
    B = int(n_time_buckets)
    span = F.col("_tmax") - F.col("_tmin")
    # null ts FIRST: the plain plan's asc sort puts nulls before every
    # non-null ts, so bucket 0 is the only position that reproduces it
    # (without this, floor(null...) is null and F.least skips the null,
    # landing null-ts rows in the LAST bucket — wrong in both directions)
    bkt = (
        F.when(F.col(ts_col).isNull(), F.lit(0))
        .when(span <= F.lit(0.0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(B - 1),
                F.floor(
                    (F.col(ts_col).cast("double") - F.col("_tmin")) * B / span
                ).cast("int"),
            )
        )
    )
    hot = tagged.filter(F.col("_tmin").isNotNull()).withColumn("_abkt", bkt)

    # phase 1: per (key, bucket, column) the last (backward) / first
    # (forward) non-null right value in window order — max_by/min_by
    # over (ts, tie) with a null ordering key for rows that don't
    # qualify (left side, or null in that column), which the aggregate
    # skips; map-side combinable, output ≤ hot_keys × B rows
    ordk = F.when(
        (F.col("_side") == 0), F.struct(F.col(ts_col), F.col("_tie"))
    )
    pick = F.max_by if direction == "backward" else F.min_by
    seeds = hot.groupBy(*by, "_abkt").agg(
        *[
            pick(
                F.col(f"{c}{suffix}"),
                F.when(F.col(f"{c}{suffix}").isNotNull(), ordk),
            ).alias(f"_s_{c}")
            for c in carried
        ]
    )
    # carry each bucket's PREDECESSOR state along the bucket axis: a
    # per-key window over ≤ B seed rows (driver-free, bounded)
    if direction == "backward":
        ws = (
            Window.partitionBy(*by)
            .orderBy(F.col("_abkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = lambda c: F.last(f"_s_{c}", ignorenulls=True).over(ws)  # noqa: E731
    else:
        ws = (
            Window.partitionBy(*by)
            .orderBy(F.col("_abkt").asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(f"_s_{c}", ignorenulls=True).over(ws)  # noqa: E731
    seed_carry = seeds.select(
        *by, "_abkt", *[carry(c).alias(f"_seed_{c}") for c in carried]
    )
    # phase 2: the fill window now partitions by (key, bucket) — no task
    # ever sorts more than ~1/B of a hot key — and falls back to the
    # carried seed where the bucket has no earlier qualifying right row.
    # seed_carry is ≤ n_hot × B rows: broadcast only when that product
    # is provably small, else let AQE size the build side
    seed_side = (
        F.broadcast(seed_carry)
        if n_hot * B <= _HOT_BROADCAST_MAX_SEED_ROWS
        else seed_carry
    )
    joined = hot.join(seed_side, [*by, "_abkt"])
    filled = window_fill(joined, [*by, "_abkt"])
    hot_out = filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[
            F.coalesce(F.col(f"_f_{c}"), F.col(f"_seed_{c}")).alias(
                f"{c}{suffix}"
            )
            for c in right_value_cols
        ],
        F.coalesce(
            F.col(f"_f_{ts_col}"), F.col(f"_seed_{ts_col}")
        ).alias(f"{ts_col}{suffix}"),
    )
    return cold_out.unionByName(hot_out)


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
