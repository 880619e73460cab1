"""Relational core (SURVEY.md §2.2–2.6).

Each reference operator that took a WHILE loop + dynamic SQL collapses to a
single lazy DataFrame transformation; Catalyst owns pushdown, pruning, join
strategy, and partial aggregation. Nothing here materializes.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_capstone_project__spark.cachereg import register
from data_engineering_capstone_project__spark.functions.fx import pad_key

_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_byte_string(value: str, default: int = 128 * 1024 * 1024) -> int:
    """Parse a Spark size conf value ('134217728b', '128MB', '1g', ...).

    Mirrors the JVM's JavaUtils.byteStringAsBytes suffix table; a value we
    can't parse falls back to ``default`` rather than crashing the caller
    (the conf is only used for a partition-count estimate).
    """
    m = re.fullmatch(r"\s*(\d+)\s*([a-z]*)\s*", value.lower())
    if not m or m.group(2) not in _SIZE_SUFFIX:
        return default
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2)]


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row work is spread across the cluster.

    A small parquet file (single row group) scans as ONE partition — every
    downstream regex/shingle/hash expression then runs single-threaded no
    matter how many cores exist. One cheap round-robin repartition fixes
    it; skipped when the scan is already parallel.
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    floor = max(2, parallelism // 2)
    files = df.inputFiles()
    if files:
        # estimate scan partitions from file sizes (driver-side metadata —
        # avoids the df.rdd conversion, which costs ~0.5 s per call)
        import os

        max_pb = _parse_byte_string(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        est = 0
        for f in files:
            path = f.removeprefix("file:")
            try:
                est += -(-os.path.getsize(path) // max_pb)
            except OSError:
                return df  # non-local storage: assume the scan is parallel
        if est < floor:
            return df.repartition(parallelism)
        return df
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(parallelism)
    return df


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P4: the reference's per-column ALTER TABLE DROP loop
    (``shareOurStrengthSQLCodev4.sql:137-154``) is one ``drop`` call;
    Catalyst's ColumnPruning then keeps dropped columns out of the scan."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: Mapping[str, str], keep_unmapped: bool = True) -> DataFrame:
    """P5: the reference's rename fold-join chain (``:202-270``, ~65 LoC,
    one shuffle-join per column) is a single Project node.

    With ``keep_unmapped=False`` this reproduces the reference exactly:
    the fold carries *only* renamed columns (+ row id) forward.
    """
    if keep_unmapped:
        return df.withColumnsRenamed(dict(mapping))
    keep = [F.col(raw).alias(clean) for raw, clean in mapping.items() if raw in df.columns]
    return df.select(*keep)


def add_row_id(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """W1: global 1-based row id by total order — scale-safely.

    The reference uses ``ROW_NUMBER() OVER (ORDER BY k)`` (``:163,:412,:666``),
    which in Spark would plan a single-partition window — a non-starter at
    100 TB (SURVEY §7.4). Two-phase instead:

    1. range-repartition on the order keys (total order across partitions),
    2. per-partition local ``row_number`` (cheap: partition-local sort),
    3. add the cumulative count of all earlier partitions (tiny driver-side
       offset map, broadcast join on partition id).

    Deterministic iff ``order_cols`` is a unique key (same caveat as the
    reference's heap-order ROW_NUMBER, SURVEY §2.5).

    Fast path (single numeric key): partition boundaries come from
    ``approxQuantile`` over just the key column, so the pid assignment is a
    deterministic EXPRESSION — the offsets job and the final job agree with
    no caching of O(table) data (two column-pruned scans + one full scan).
    Multi-column / string / bool keys take the same expression route via an
    order-preserving null-free encoding (see ``_encode_order_key``):
    boundaries are sampled once on the driver and baked into the plan as
    struct literals, so again nothing is persisted. Only genuinely
    non-encodable key types (arrays, maps, binary, ...) fall back to
    range-repartition + persist (RangePartitioner's sampled boundaries
    differ across re-executions, so that path must cache).
    """
    cols = [F.col(c) for c in order_cols]
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism

    from data_engineering_capstone_project__spark.session import no_aqe

    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float", "date", "timestamp"}
    dtypes = dict(df.dtypes)
    if len(order_cols) == 1 and dtypes[order_cols[0]] in numeric:
        key = order_cols[0]
        kc = F.col(key).cast("double")
        probs = [i / n for i in range(1, n)]
        with no_aqe(spark):
            bounds = sorted(set(df.stat.approxQuantile(key, probs, 0.001)))
        pid = F.lit(0)
        for b in bounds:
            pid = pid + F.when(kc > F.lit(float(b)), 1).otherwise(0)
        parted = df.withColumn("_pid", pid)
    elif all(_encodable(dtypes[c]) for c in order_cols):
        pid = _expression_pid(df, order_cols, n)
        parted = df.withColumn("_pid", pid)
    else:
        # NOT registered in cachereg: this lineage is NONDETERMINISTIC
        # (RangePartitioner samples boundaries per execution), and the
        # partition sizes are collected below — if a global
        # release_intermediates() unpersisted it before the caller's
        # final action, recompute could reassign _pid against the
        # already-collected offsets and emit wrong/duplicate row ids.
        # cachereg's early-release-is-safe contract only holds for
        # deterministic relations, so this persist stays unmanaged for
        # the frame's lifetime (rare path: non-encodable key types only).
        parted = (
            df.repartitionByRange(n, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .persist()
        )
    # partition sizes -> cumulative offsets (metadata-sized collect: one row per partition)
    with no_aqe(spark):
        sizes = parted.groupBy("_pid").count().collect()
    offsets, run = {}, 0
    for row in sorted(sizes, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = run
        run += row["count"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        parted.withColumn("_local", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


_ENCODABLE_EXACT = {
    "int", "bigint", "smallint", "tinyint", "double", "float",
    "date", "timestamp", "timestamp_ntz", "string", "boolean",
}


def _encodable(dtype: str) -> bool:
    return dtype in _ENCODABLE_EXACT or dtype.startswith("decimal")


def _null_default(dtype: str):
    """A typed placeholder for NULL inside the order-key encoding. The
    value itself never decides an ordering (the null flag field sorts
    first); it only has to be a valid literal of the column's type."""
    if dtype == "string":
        return ""
    if dtype == "boolean":
        return False
    if dtype == "date":
        import datetime

        return datetime.date(1970, 1, 1)
    if dtype.startswith("timestamp"):
        import datetime

        return datetime.datetime(1970, 1, 1)
    return 0


def _encode_order_key(order_cols: Sequence[str], dtypes: Mapping[str, str]) -> Column:
    """Null-free orderable struct over the key tuple, matching the window's
    ``asc_nulls_first`` semantics exactly: each column becomes a
    (is-not-null flag, coalesced value) field pair, so NULLs sort below
    every real value and struct comparison needs no null handling."""
    fields: list[Column] = []
    for i, c in enumerate(order_cols):
        t = dtypes[c]
        fields.append(
            F.when(F.col(c).isNull(), F.lit(0)).otherwise(F.lit(1)).alias(f"f{i}")
        )
        fields.append(
            F.coalesce(F.col(c), F.lit(_null_default(t)).cast(t)).alias(f"v{i}")
        )
    return F.struct(*fields)


def _lit_encoded(values: Sequence, order_cols: Sequence[str], dtypes: Mapping[str, str]) -> Column:
    """Literal counterpart of ``_encode_order_key`` for a collected row."""
    fields: list[Column] = []
    for i, (c, v) in enumerate(zip(order_cols, values)):
        t = dtypes[c]
        if v is None:
            fields.append(F.lit(0).alias(f"f{i}"))
            fields.append(F.lit(_null_default(t)).cast(t).alias(f"v{i}"))
        else:
            fields.append(F.lit(1).alias(f"f{i}"))
            fields.append(F.lit(v).cast(t).alias(f"v{i}"))
    return F.struct(*fields)


def _expression_pid(df: DataFrame, order_cols: Sequence[str], n: int) -> Column:
    """Deterministic range-partition id as a pure EXPRESSION.

    Boundaries are sampled once (driver-side, ~128·n key tuples from a
    column-pruned scan) and baked into the plan as struct literals, so
    every job that evaluates the expression assigns identical pids — the
    property ``add_row_id`` needs across its offsets job and final job —
    with no persist of O(table) data. Monotonic w.r.t. the order columns
    (asc_nulls_first) because both the encoding and Spark's struct
    comparison are lexicographic.
    """
    from data_engineering_capstone_project__spark.session import no_aqe

    dtypes = dict(df.dtypes)
    with no_aqe(df.sparkSession):
        cnt = df.count()
        if cnt == 0:
            return F.lit(0)
        frac = min(1.0, (n * 128) / cnt)
        rows = df.select(*order_cols).sample(fraction=frac, seed=42).collect()
    if not rows:
        return F.lit(0)

    def sort_key(row):
        return tuple((0, 0) if v is None else (1, v) for v in row)

    ordered = sorted(rows, key=sort_key)
    raw_bounds, seen = [], set()
    for i in range(1, n):
        r = ordered[min(i * len(ordered) // n, len(ordered) - 1)]
        k = sort_key(r)
        if k not in seen:
            seen.add(k)
            raw_bounds.append(tuple(r))
    enc = _encode_order_key(order_cols, dtypes)
    pid = F.lit(0)
    for b in raw_bounds:
        pid = pid + F.when(enc > _lit_encoded(b, order_cols, dtypes), 1).otherwise(0)
    return pid


def linkage_join(
    left: DataFrame,
    right: DataFrame,
    exact_keys: Sequence[tuple[str, str]],
    padded_keys: Sequence[tuple[str, str]] = (),
    pad_width: int = 6,
    how: str = "inner",
    distinct: bool = True,
) -> DataFrame:
    """J4: multi-key record-linkage join with expression keys.

    The reference's flagship "Join Scenario #1"
    (``shareOurStrengthSQLCodev4.sql:1079-1089``): equi-join on exact columns
    plus zero-padded id columns, then ``SELECT DISTINCT a.*, b.*``. Spark
    plans this as a sort-merge join on the computed keys (still an equi-join,
    so no theta-join blowup); AQE handles skewed linkage keys.
    """
    conds: list[Column] = [left[a] == right[b] for a, b in exact_keys]
    conds += [
        pad_key(left[a], pad_width) == pad_key(right[b], pad_width)
        for a, b in padded_keys
    ]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    out = left.join(right, cond, how)
    return out.distinct() if distinct else out


def salted_group_count(
    df: DataFrame,
    group_cols: Sequence[str],
    n_salts: int = 16,
    count_col: str = "cnt",
) -> DataFrame:
    """Skew-resistant two-phase aggregation: explode a hot grouping key
    across ``n_salts`` shards (random salt), partial-aggregate per
    (key, salt), then combine. Result identical to a plain
    ``groupBy().count()``; at 100 TB this bounds the largest reduce task
    by 1/n_salts of the hottest key. (AQE's skewJoin handles skewed JOINs;
    salting covers skewed AGGREGATIONS, which AQE does not split.)
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*group_cols).agg(
        F.sum("_c").alias(count_col)
    )


def train_test_split(
    df: DataFrame,
    test_fraction: float = 0.1,
    id_col: str | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/test split for dataset prep.

    With ``id_col``: hash-based assignment (xxhash64(id, seed) mod) — stable
    across runs AND across engines, rows never switch sides when the data
    grows (the property training pipelines need). Without: Spark's
    ``randomSplit`` (seeded, but partition-layout dependent).
    """
    if id_col is None:
        train, test = df.randomSplit([1 - test_fraction, test_fraction], seed=seed)
        return train, test
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    is_test = bucket < int(test_fraction * 1_000_000)
    return df.filter(~is_test), df.filter(is_test)


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE-style upsert without a transactional table format: rows from
    ``updates`` replace same-key rows in ``base``; unmatched update rows are
    inserted. (With Delta/Iceberg on the classpath this becomes MERGE INTO;
    the anti-join + union shape is the format-free equivalent and plans as
    one shuffle per side on the key.)
    """
    kept = base.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


_WGL_MEMO: dict[tuple, bool] = {}


def _window_group_limit_fires(spark, k: int) -> bool:
    """True when the optimizer's WindowGroupLimit rewrite fires for the
    ``row_number().over(partitionBy+orderBy)`` + ``filter(rank <= k)``
    shape :func:`top_k_per_group` constructs. The rule is a logical-plan
    pattern match — data- and child-independent — so a 3-node synthetic
    plan of the same shape answers for every real plan at the same
    (runtime, threshold conf, k); memoized per session."""
    try:
        thr = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold", None)
        # a session that excludes optimizer rules can suppress the
        # rewrite at any threshold — key the memo on that conf too so a
        # sibling session's probe result is never served to it
        excl = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    except Exception:  # noqa: BLE001 — conf surface varies across runtimes
        thr = excl = None
    # applicationId, not id(sparkContext) (review r15): a Python id can
    # alias a new context after the old one is GC'd; the applicationId
    # string is unique per started context
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — stopped context: don't memoize wrong
        app = object()  # unmatchable key component
    key = (app, spark.version, thr, excl, int(k))
    hit = _WGL_MEMO.get(key)
    if hit is None:
        # distinct, non-equal expressions for the partition and order
        # keys (equal attributes let the optimizer simplify the window
        # away), and a child whose known maxRows exceeds k (the rule
        # skips when the limit provably covers the input — real scans
        # have unknown maxRows, so the big-child probe mirrors them)
        probe = (
            spark.range(int(k) + 100)
            .select(
                (F.col("id") % 2).alias("_g"),
                (F.col("id") + 1).alias("_v"),
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("_g").orderBy("_v")
                ),
            )
            .filter(F.col("_rn") <= k)
        )
        hit = (
            "WindowGroupLimit"
            in probe._jdf.queryExecution().executedPlan().toString()
        )
        _WGL_MEMO[key] = hit
    return hit


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    two_phase: bool = True,
    total_order: bool = False,
) -> DataFrame:
    """W2 helper: windowed top-k (rank ≤ k per group).

    Scale note: a naive ``Window.partitionBy(group)`` would sort each
    group's ENTIRE row set in one task — with few groups (e.g. 3
    return flags over 100 TB) that is ~33 TB per task. Spark ≥3.5
    rescues the single-window form when the rank filter is adjacent:
    the ``WindowGroupLimit`` rule plans a PARTIAL map-side prune to k
    rows per (group, input partition) BEFORE the exchange, so only
    k·partitions·groups rows shuffle.

    ``two_phase=True`` (default) means "guarantee map-side pruning":
    the single-window plan is built first and its physical plan
    INSPECTED — if WindowGroupLimit fired (the common case on Spark
    ≥3.5), that plan is used as-is, because an explicit second phase
    would only add a redundant exchange and two extra sorts on top of
    the native Partial/Final prune. Only where the rule can't fire
    (rank reused as a column downstream, rank-with-offset filters,
    older runtimes) does the explicit fallback run: top-k per (group,
    ``spark_partition_id``), then the per-group window over
    ≤ k·num_partitions survivors, with a content-hash tiebreaker
    (xxhash64 over all input columns) appended in both phases so the
    pruning is deterministic and partitioning-independent even under a
    non-total ``order_by`` (exact duplicate rows still tie, but are
    interchangeable). Callers that can GUARANTEE a total order may
    pass ``total_order=True`` to skip the tiebreaker hash in the
    fallback; the inspected native plan never needs it — its
    semantics are exactly the single-window form's.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    naive = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    if not two_phase:
        return naive
    # plan-shape probe. Whether the optimizer installs the map-side
    # Partial WindowGroupLimit prune for THIS construction (one
    # row_number window expression, non-empty orderBy, adjacent
    # rank-limit filter) depends only on the runtime version, the
    # optimizer.windowGroupLimitThreshold conf, and k — never on the child
    # plan or the data — so since r15 the probe plans a 3-node
    # SYNTHETIC query of the same shape once per (session, conf, k)
    # and memoizes, instead of physically planning the caller's full
    # tree on every call (measured 0.33 s per probe on the BM25
    # retrieval plans; the probe's planning work was discarded —
    # the write action re-plans from the logical plan anyway).
    # tests/test_r15_optimization.py pins synthetic ≡ real on
    # representative shapes. Review r15 asked whether a
    # NON-DETERMINISTIC order expression (e.g. rand()) breaks the
    # transfer — InferWindowGroupLimit requires deterministic window
    # expressions — but it cannot for this construction: the analyzer
    # extracts any non-deterministic order expression into a Project
    # BELOW the window (``rand(7) AS _w0``), so by optimization time the
    # window's sort key is a plain attribute and the rule fires exactly
    # as on the synthetic twin (pinned empirically by
    # tests/test_r16_optimization.py::test_wgl_fires_for_nondeterministic_order).
    if _window_group_limit_fires(df.sparkSession, k):
        return naive
    # conservative fallback (rule did not fire on the synthetic twin):
    # inspect the real plan before paying the explicit two-phase shape
    plan = naive._jdf.queryExecution().executedPlan().toString()
    if "WindowGroupLimit" in plan:
        return naive
    if total_order:
        base, order_tb, tb = df, list(order_by), None
    else:
        tb = "__topk_tb"
        base = df.withColumn(tb, F.xxhash64(*[F.col(c) for c in df.columns]))
        order_tb = [*order_by, F.col(tb).asc()]
    pid = "__topk_pid"
    w1 = Window.partitionBy(*group_cols, pid).orderBy(*order_tb)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_tb)
    pruned = (
        base.withColumn(pid, F.spark_partition_id())
        .withColumn(rank_col, F.row_number().over(w1))
        .filter(F.col(rank_col) <= k)
        .drop(pid, rank_col)
    )
    out = pruned.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
    return out.drop(tb) if tb else out


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic hash sample: keep rows whose md5(key|salt) prefix
    falls below the fraction threshold.

    Unlike ``df.sample`` this is stable under data growth and re-runs (a
    key is in or out forever, per salt), reproducible across engines (md5
    everywhere — no seed plumbing), and needs no shuffle: a codegen'd
    filter at the scan. Granularity is 1/65536.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return df  # keep-all: the 4-hex-digit threshold can't express 0x10000
    h = F.substring(
        F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))), 1, 4
    )
    return df.filter(h < F.lit(_hash_threshold(fraction)))


def _hash_threshold(fraction: float) -> str:
    """4-hex-digit md5-prefix cutoff for ``h < threshold`` sampling.

    A fraction that rounds to the full 0x10000 range would format as the
    5-char '10000', which compares lexicographically *below* most 4-char
    prefixes and silently keeps ~6% instead of 100% — clamp to 'g', which
    every hex prefix sorts under.
    """
    v = int(round(fraction * 16 ** 4))
    return "g" if v >= 16 ** 4 else format(v, "04x")


def weighted_sample_by_hash(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    priority_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws an exponential arrival time
    ``priority = −ln(u)/w`` and the ``k`` smallest priorities win —
    inclusion probability is proportional-to-weight without replacement,
    the standard way to bias a training corpus toward high-quality
    documents while keeping diversity.

    The uniform ``u`` is hash-derived, not ``rand()``: the first 52 bits
    of ``md5(key|salt)`` as ``(v + 0.5) / 2^52`` — so the sample is
    reproducible across runs, engines, AND task retries (a ``rand()``
    seed re-draws on Spark retry, silently changing the sample under
    executor loss; md5 of the row key cannot), and every arithmetic step
    (dyadic division, libm ln, one double divide) is bit-identical to
    the DuckDB oracle. Same determinism contract as ``sample_by_hash``;
    a different ``salt`` is a fresh independent sample.

    Rows with NULL or non-positive weight are excluded (zero-weight rows
    have infinite arrival time). The global top-k plans as
    ``TakeOrderedAndProject`` — per-partition partial top-k then a
    k-bounded merge, never a full sort — so the only cross-cluster
    traffic is k rows per partition. Appends ``priority_col`` when
    requested (oracle-comparable at ``pround(…, 6)``).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    pri = -F.log(u) / w
    out = (
        df.filter(w.isNotNull() & (w > 0.0))
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").asc(), F.col(key_col).asc())
        .limit(k)
    )
    if priority_col is None:
        return out.drop("_pri")
    return out.withColumnRenamed("_pri", priority_col)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    priority_col: str | None = None,
) -> DataFrame:
    """Per-group :func:`weighted_sample_by_hash`: the ``k``
    smallest-priority rows WITHIN each group — balanced corpus draws
    (k docs per source/language, biased by quality weight) in one pass.

    Same A-ES priorities (hash-derived, retry-/engine-reproducible); the
    per-group top-k goes through :func:`top_k_per_group`, so each group
    is pruned to k rows per input partition map-side before the single
    exchange — never a per-group full sort, regardless of how skewed
    group sizes are."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    out = top_k_per_group(
        df.filter(w.isNotNull() & (w > 0.0)).withColumn("_pri", -F.log(u) / w),
        list(group_cols),
        [F.col("_pri").asc(), F.col(key_col).asc()],
        k,
        total_order=True,
    )
    if priority_col is None:
        return out.drop("_pri")
    return out.withColumnRenamed("_pri", priority_col)


def sketch_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    rsd: float = 0.05,
    percentiles: Sequence[float] = (0.5, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass approximate profile via Spark's built-in mergeable
    sketches: HyperLogLog++ cardinality of ``key_col``
    (``approx_count_distinct``, relative sd ``rsd``) and GK quantile
    summaries of ``value_col`` (``percentile_approx``, error ≤
    1/``accuracy`` in RANK space per the GK guarantee).

    The 100 TB point: both sketches hold BOUNDED state per partition
    (HLL registers / GK summary) and merge associatively map-side, so
    the profile costs one scan + a few-KB shuffle — against
    ``COUNT(DISTINCT …)``'s full de-dup shuffle and exact percentile's
    global sort. This is the planner-input profile (how many distinct
    join keys? where do value thresholds sit?) you compute BEFORE
    choosing salting factors, bucket counts, or quantile filters.

    Returns one row: ``(n_rows, approx_distinct, approx_ps)``.
    """
    return df.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(key_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(
            value_col, list(percentiles), accuracy
        ).alias("approx_ps"),
    )


def frequent_items_sketch(
    df: DataFrame, col: str, k: int = 100
) -> DataFrame:
    """Misra-Gries heavy hitters in ONE bounded-state pass — the third
    member of the planner-input profiling trio (HLL++ cardinality + GK
    quantiles in :func:`sketch_profile`; this one answers "WHICH keys
    are hot", the direct input to salting factors and skew-join hints,
    where :func:`skew_profile`'s exact groupBy pays a full count
    shuffle).

    Per partition, an Arrow-batched kernel folds ``value_counts`` into
    ≤ ``k`` counters; overflow subtracts the (k+1)-th largest counter
    value from ALL counters and drops the non-positive (the batched
    Misra-Gries decrement — each round removes that value from ≥ k+1
    counters, so a partition's total decrement ≤ N_p/(k+1)). Summaries
    merge by plain per-item SUM (each partition's counter is within
    [true_p − dec_p, true_p], so the sums telescope), giving the
    classic guarantees with ``err`` = Σ partition decrements:

    - ``est_count ≤ true count ≤ est_count + err``;
    - every item with true count > ``err`` (≤ N/(k+1)) IS present;
    - with ≤ k distinct values the sketch is EXACT (err = 0).

    Shuffle cost: ≤ (k+1) rows per partition (k counters + one
    decrement row), independent of N — vs the full-width exchange of
    an exact groupBy count. Returns ``(item, est_count, err_bound,
    n_rows)`` with the scalars repeated per row (one cross-joined
    1-row relation). Items ride as strings (the hash key the kernel
    counted); cast back as needed.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("dec", T.LongType()),
        ]
    )

    def mg(batches):
        counters: dict[str, int] = {}
        dec_total = 0
        for pdf in batches:
            vc = pdf[col].astype("string").dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                d = vals[k]  # the (k+1)-th largest
                counters = {
                    i: c - d for i, c in counters.items() if c - d > 0
                }
                dec_total += d
        rows = [(i, c, 0) for i, c in counters.items()]
        rows.append((None, 0, dec_total))
        yield pd.DataFrame(rows, columns=["item", "cnt", "dec"])

    summaries = register(
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(mg, out_schema)
        .persist()
    )
    scalars = F.broadcast(
        summaries.agg(F.sum("dec").alias("err_bound")).crossJoin(
            df.agg(F.count(col).alias("n_rows"))
        )
    )
    return (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est_count"))
        .crossJoin(scalars)
    )


def _segment_scheme(n: Column, i: int, parts: int) -> tuple[Column, Column]:
    """(start, length) of segment ``i`` in the even ``parts``-way partition
    of a string of length ``n`` — the first ``n % parts`` segments take the
    extra character. Both join sides must use this exact formula."""
    base = F.floor(n / parts).cast("int")
    rem = (n % parts).cast("int")
    length = base + F.when(F.lit(i) < rem, 1).otherwise(0)
    start = F.lit(i) * base + F.least(F.lit(i), rem)
    return start, length


def fuzzy_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    block_keys: Sequence[tuple[str, str]],
    fuzzy_keys: Sequence[tuple[str, str]],
    max_distance: int = 2,
) -> DataFrame:
    """Distinct verified (block, left-fuzzy, right-fuzzy) value tuples with
    every fuzzy pair within ``max_distance`` edits — the candidate core of
    the segment-blocked ``fuzzy_linkage_join``, exposed so tests and skew
    probes can count candidates without materializing the full join.

    Scale shape (PassJoin pigeonhole): a string pair within d edits must
    share one of the right string's d+1 even segments verbatim, shifted by
    at most d positions. The right side explodes to d+1 ``(len, i, seg)``
    keys; the left side explodes to the bounded set of substrings such a
    surviving segment could be — (2d+1) hypothesized lengths × (d+1)
    segments × (2d+1) shifts, minus clipping. Candidates then come from a
    selective equi-join on ``(block…, len, i, seg)`` over DISTINCT key
    projections instead of a Σ block² within-block scan, so one hot block
    key cannot go quadratic; only survivors pay ``levenshtein``. Right
    strings shorter than d+1 (no nonempty pigeonhole partition) fall back
    to a within-block scan, where the length band |len(l)−len(r)| ≤ d
    bounds the left side to strings of length ≤ 2d.
    """
    d = max_distance
    parts = d + 1
    nb = len(block_keys)
    bl = [f"__fzb{i}" for i in range(nb)]
    fl = [f"__fzl{j}" for j in range(len(fuzzy_keys))]
    fr = [f"__fzr{j}" for j in range(len(fuzzy_keys))]
    lk = left.select(
        *[left[a].alias(n) for (a, _), n in zip(block_keys, bl)],
        *[left[a].alias(n) for (a, _), n in zip(fuzzy_keys, fl)],
    ).distinct()
    rk = right.select(
        *[right[b].alias(n) for (_, b), n in zip(block_keys, bl)],
        *[right[b].alias(n) for (_, b), n in zip(fuzzy_keys, fr)],
    ).distinct()

    t_r, t_l = F.col(fr[0]), F.col(fl[0])

    # right side: one (len, i, segment) key per pigeonhole segment
    rn = F.length(t_r)
    r_entries = []
    for i in range(parts):
        start, length = _segment_scheme(rn, i, parts)
        r_entries.append(
            F.struct(
                F.lit(i).alias("i"), t_r.substr(start + 1, length).alias("seg")
            )
        )
    r_exp = (
        rk.filter(rn >= parts)
        .withColumn("__fzn", rn.cast("int"))
        .withColumn("__fze", F.explode(F.array(*r_entries)))
        .select(*bl, *fr, "__fzn", F.col("__fze.i").alias("__fzi"),
                F.col("__fze.seg").alias("__fzseg"))
    )

    # left side: every substring a surviving segment could be, for each
    # hypothesized right length m+dn and shift in [-d, d]
    m = F.length(t_l)
    l_entries = []
    for dn in range(-d, d + 1):
        n_hyp = (m + dn).cast("int")
        for i in range(parts):
            start, length = _segment_scheme(n_hyp, i, parts)
            for shift in range(-d, d + 1):
                q = start + shift
                valid = (
                    (n_hyp >= parts)
                    & (q >= 0)
                    & (q + length <= m)
                    & (length >= 1)
                )
                l_entries.append(
                    F.when(
                        valid,
                        F.struct(
                            n_hyp.alias("n"),
                            F.lit(i).alias("i"),
                            t_l.substr(q + 1, length).alias("seg"),
                        ),
                    )
                )
    l_exp = (
        lk.withColumn(
            "__fze",
            F.explode(
                F.array_distinct(
                    F.filter(F.array(*l_entries), lambda x: x.isNotNull())
                )
            ),
        )
        .select(*bl, *fl, F.col("__fze.n").alias("__fzn"),
                F.col("__fze.i").alias("__fzi"),
                F.col("__fze.seg").alias("__fzseg"))
    )

    on = [*bl, "__fzn", "__fzi", "__fzseg"]
    cand = l_exp.join(r_exp, on=on, how="inner").select(*bl, *fl, *fr)

    # right strings too short to pigeonhole: within-block scan, but the
    # length band caps the left side at 2d characters
    r_short = rk.filter(rn < parts)
    l_short = lk.filter(m <= 2 * d)
    cand_short = l_short.join(r_short, on=bl, how="inner").select(*bl, *fl, *fr)

    out = cand.unionByName(cand_short).distinct()
    for lcol, rcol in zip(fl, fr):
        out = out.filter(
            (F.abs(F.length(lcol) - F.length(rcol)) <= d)
            & (F.levenshtein(F.col(lcol), F.col(rcol)) <= d)
        )
    return out


def fuzzy_linkage_join(
    left: DataFrame,
    right: DataFrame,
    block_keys: Sequence[tuple[str, str]],
    fuzzy_keys: Sequence[tuple[str, str]],
    max_distance: int = 2,
    how: str = "inner",
    method: str = "auto",
) -> DataFrame:
    """Record linkage with dirty keys: exact equi-join on blocking keys,
    then a Levenshtein match on the fuzzy keys.

    ``method``:
      * ``'scan'`` — equi-join on the blocking keys with a length-band
        predicate (|len(l)−len(r)| ≤ d, a necessary condition for edit
        distance ≤ d) pushed into the join condition so the cheap band
        check runs during the merge, before any ``levenshtein``. Candidate
        work is Σ block² — fine until one block key is hot.
      * ``'segment'`` — inner joins only: PassJoin-style pigeonhole
        blocking via ``fuzzy_candidate_pairs`` (see there for the scale
        argument), then two hash joins rebuild full rows from the verified
        candidate value-tuples, preserving duplicate-row multiplicity. A
        hot block no longer goes quadratic: candidates come from a
        selective ``(block…, len, segment)`` equi-join.
      * ``'auto'`` — ``'segment'`` for inner joins with 1 ≤ d ≤ 3, else
        ``'scan'``.

    Both paths return left-columns + right-columns, exactly the rows of
    the block equi-join whose every fuzzy pair is within ``max_distance``.
    The J4 linkage join is the exact-key special case of this.
    """
    d = max_distance
    if method == "auto":
        method = "segment" if how == "inner" and 1 <= d <= 3 else "scan"
    if method == "segment" and how != "inner":
        raise ValueError("method='segment' supports how='inner' only")

    if method == "scan":
        # ALL fuzzy predicates live in the join condition, not a
        # post-join filter: a filter after an outer join would drop the
        # NULL-extended rows, silently degrading how='left'/'right'/
        # 'full' to inner semantics. Catalyst extracts the equality
        # conjuncts as hash keys; the band check precedes levenshtein in
        # the residual condition so the cheap length test short-circuits
        # the expensive edit distance during the merge.
        conds: list[Column] = [left[a] == right[b] for a, b in block_keys]
        for a, b in fuzzy_keys:
            conds.append(
                F.abs(F.length(left[a]) - F.length(right[b])) <= d
            )
            conds.append(F.levenshtein(left[a], right[b]) <= d)
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        return left.join(right, cond, how)

    cand = fuzzy_candidate_pairs(left, right, block_keys, fuzzy_keys, d)
    nb = len(block_keys)
    bl = [f"__fzb{i}" for i in range(nb)]
    fl = [f"__fzl{j}" for j in range(len(fuzzy_keys))]
    fr = [f"__fzr{j}" for j in range(len(fuzzy_keys))]

    lc = [left[a] == cand[n] for (a, _), n in zip(block_keys, bl)]
    lc += [left[a] == cand[n] for (a, _), n in zip(fuzzy_keys, fl)]
    cond_l = lc[0]
    for c in lc[1:]:
        cond_l = cond_l & c
    half = left.join(cand, cond_l, "inner")

    rc = [half[n] == right[b] for (_, b), n in zip(block_keys, bl)]
    rc += [half[n] == right[b] for (_, b), n in zip(fuzzy_keys, fr)]
    cond_r = rc[0]
    for c in rc[1:]:
        cond_r = cond_r & c
    return half.join(right, cond_r, "inner").drop(*bl, *fl, *fr)


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without RNG):
    each stratum gets its own md5-prefix threshold, so class rebalancing
    is reproducible across runs, engines, and data growth.

    One codegen'd CASE over the strata — no shuffle, no seed state. The
    standard shape for downsampling over-represented sources/languages in
    a training mix.
    """
    h = F.substring(
        F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))), 1, 4
    )
    thresh = F.lit(_hash_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0,1]")
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_hash_threshold(frac))
        ).otherwise(thresh)
    return df.filter(h < thresh)


def skew_profile(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Heavy-hitter diagnostic for shuffle planning: the ``top_n`` hottest
    key values with row count, share of all rows, skew ratio vs the mean
    key size, and the salt factor that would level each one —
    ``ceil(skew_ratio)``, the number to hand ``salted_group_count`` (a key
    at 40× the mean wants ~40 salt buckets so its partial aggregates
    spread over 40 tasks).

    One hash aggregation (map-side partials — profiling a skewed table
    doesn't itself skew), a broadcast 1-row totals join, and a global
    top-n that compiles to TakeOrderedAndProject (per-partition heap +
    driver merge, no sort shuffle). Cost ≈ one groupBy-count of the table
    — cheap enough to run ahead of any big join/agg as a planning probe.
    """
    from data_engineering_capstone_project__spark.functions.fx import pround

    key_cols = [F.col(k) for k in keys]
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_nkeys")
    )
    ratio = F.col("n") * F.col("_nkeys") / F.col("_total")
    return (
        counts.join(F.broadcast(totals))
        .select(
            *keys,
            "n",
            pround(F.col("n") / F.col("_total"), 6).alias("share"),
            pround(ratio, 6).alias("skew_ratio"),
            F.ceil(ratio).cast("long").alias("salt_factor"),
        )
        .orderBy(F.desc("n"), *key_cols)
        .limit(top_n)
    )


def deterministic_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: str = "",
    pos_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded, engine-portable global shuffle — training-order assignment.

    Epoch shuffling for a training corpus must be (a) deterministic given a
    seed (resumable jobs re-derive the identical order), (b) independent of
    input partitioning/file layout, and (c) free of single-point sorts. A
    plain ``df.orderBy(rand(seed))`` fails (a): Spark's rand() is seeded
    per-partition, so the order changes whenever the scan splits differently.

    Order key = ``md5(key_cols | seed)`` — a pure expression over row
    content, identical on every engine and layout. Changing ``seed``
    re-deals the whole corpus (a new epoch); keeping it reproduces the
    exact order.

    With ``pos_col=None``: returns the rows range-partitioned + sorted by
    the shuffle hash (a total order across partitions — Spark's sort
    machinery, no driver funnel), ready for a partitioned write in training
    order. With ``pos_col``: additionally materializes the 0-based global
    position via the two-phase ``add_row_id`` (expression-encoded
    boundaries, no single-partition window, nothing persisted).

    Deterministic iff ``key_cols`` is a unique key (md5 collisions on the
    128-bit digest are not a practical concern).
    """
    hcol = F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
        )
    )
    out = df.withColumn("_shuffle_key", hcol)
    if pos_col is None:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        return (
            out.repartitionByRange(n, "_shuffle_key")
            .sortWithinPartitions("_shuffle_key")
            .drop("_shuffle_key")
        )
    out = add_row_id(
        out, ["_shuffle_key"], id_col=pos_col, num_partitions=num_partitions
    )
    return out.withColumn(pos_col, F.col(pos_col) - 1).drop("_shuffle_key")


def quantile_threshold(
    df: DataFrame,
    value_col: str,
    p: float,
    by: Sequence[str] = (),
    precision: int = 4,
    out_col: str = "threshold",
) -> DataFrame:
    """Exact per-group quantile threshold with bounded state at any scale.

    Returns, per ``by`` group, the smallest value ``q`` (quantized to
    ``precision`` decimals) whose cumulative row fraction reaches ``p`` —
    i.e. the discrete lower quantile: ``min q : |rows <= q| >= ceil(p*n)``.

    Exact percentile aggregates buffer every distinct value per group —
    unbounded memory on continuous scores at 100 TB. Quantizing first caps
    the domain (<= 10^precision distinct values per unit range), so the
    plan is: partial-agg ``groupBy(by, q).count()`` (map-side combine
    absorbs any skew — hot groups shrink to their quantized domain before
    the shuffle), then a window over the *tiny* distinct-value relation
    (<= domain-size rows per group, nowhere near the input size), then a
    one-row-per-group min. Integer count arithmetic throughout — no float
    interpolation to drift across engines.
    """
    from data_engineering_capstone_project__spark.functions.fx import pround

    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0,1], got {p}")
    by = list(by)
    q = pround(F.col(value_col).cast("double"), precision).alias("_q")
    counts = df.groupBy(*[F.col(c) for c in by], q).agg(
        F.count("*").alias("_c")
    )
    wcum = (
        Window.partitionBy(*by)
        .orderBy("_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*by)
    cum = counts.select(
        *by,
        "_q",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wtot).alias("_tot"),
    )
    hit = cum.filter(
        F.col("_cum") >= F.ceil(F.lit(float(p)) * F.col("_tot"))
    )
    if by:
        return hit.groupBy(*by).agg(F.min("_q").alias(out_col))
    return hit.agg(F.min("_q").alias(out_col))


def quantile_filter(
    df: DataFrame,
    value_col: str,
    p: float,
    by: Sequence[str] = (),
    precision: int = 4,
) -> DataFrame:
    """Keep rows at or above their group's ``p``-quantile of ``value_col``.

    The per-language quality gate of a training mix: "top half of German
    by quality, top half of English by quality, ..." — relative bars per
    group instead of one global constant that over-prunes low-resource
    slices.

    The threshold side is ``quantile_threshold`` (bounded-state exact
    quantile); it lands as one row per group, so the join back is an
    automatic broadcast and the filter stays a scan-side predicate. The
    compare quantizes the row value to the same precision the threshold
    domain used, so boundary rows behave identically on every engine.
    Contract: ``by`` is a LOW-cardinality grouping (languages, sources,
    domains) — the broadcast is one row per group, so a high-cardinality
    key (users, documents) does not fit this operator's shape (and the
    per-group quantile itself would degenerate to per-row bars there).
    """
    by = list(by)
    from data_engineering_capstone_project__spark.functions.fx import pround

    thr = quantile_threshold(
        df, value_col, p, by=by, precision=precision, out_col="_thr"
    )
    rounded = pround(F.col(value_col).cast("double"), precision)
    if by:
        return (
            df.join(F.broadcast(thr), on=by, how="inner")
            .filter(rounded >= F.col("_thr"))
            .drop("_thr")
        )
    return (
        df.join(F.broadcast(thr))
        .filter(rounded >= F.col("_thr"))
        .drop("_thr")
    )
