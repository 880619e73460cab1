"""Physical-plan guarantees at scale: bucketed joins shuffle nothing,
partitioned writes prune at the scan."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.sources.io import (
    write_bucketed,
    write_parquet,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "cust_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    write_bucketed(orders, "orders_b", ["o_custkey"], n_buckets=8)
    write_bucketed(customer, "cust_b", ["c_custkey"], n_buckets=8)
    o = spark.table("orders_b")
    c = spark.table("cust_b")
    joined = o.join(
        c.hint("merge"), o.o_custkey == c.c_custkey
    )  # force SMJ so broadcast doesn't mask the bucketing
    plan = _physical_plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == orders.count()


def test_partitioned_write_prunes(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="part_events_")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_parquet(li, out, partition_by=["l_returnflag"])
        flags = [r[0] for r in li.select("l_returnflag").distinct().collect()]
        back = spark.read.parquet(out).filter(F.col("l_returnflag") == flags[0])
        plan = _physical_plan(back)
        # partition filter reaches the scan; no row-level filter needed
        assert "PartitionFilters: [isnotnull(l_returnflag" in plan, plan
        expect = li.filter(F.col("l_returnflag") == flags[0]).count()
        assert back.count() == expect
        # only the matching partition directory is listed
        dirs = [d for d in os.listdir(out) if d.startswith("l_returnflag=")]
        assert len(dirs) == len(flags)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_q13_aggregates_before_join(spark, sf_dir):
    """Q13's plan must collapse orders to one row per customer BEFORE the
    customer join (shuffle ∝ customers, not orders)."""
    import __spark_entry__ as em

    df = em.queries()["q13_order_distribution"](spark, sf_dir)
    plan = _physical_plan(df)
    join_pos = plan.find("Join")
    assert join_pos > 0, plan
    # an aggregate must appear below (after, in toString order) the join
    assert "HashAggregate" in plan[join_pos:], plan


def test_q7_filters_reach_scans_and_dims_broadcast(spark, sf_dir):
    """Q7: ship-date range is pushed to the lineitem scan; the
    nation-filtered supplier and customer sides broadcast."""
    import __spark_entry__ as em

    df = em.queries()["q7_volume_shipping"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_tf_idf_deskewed_single_explode_no_python(spark, sf_dir):
    """TF-IDF plan stays JVM-side and skew-safe: document frequency is an
    aggregate + join-back (NO per-term Window — that would sort a
    stopword's full posting list in one task), the token explode feeds
    both join branches through one cached relation, and there are no
    Python/Arrow eval nodes."""
    from data_engineering_capstone_project__spark.operators.text import tf_idf

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _physical_plan(tf_idf(d))
    assert "Window" not in plan, plan
    # the explode is computed once: every Generate in the printout sits
    # under the persisted tf relation, not duplicated into live branches
    assert "InMemoryTableScan" in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_embedding_near_dups_plan_is_bucketed(spark, sf_dir):
    """The oracle-checked embedding near-dup query must route through the
    LSH bucketed equi-join — never a nested-loop/cartesian all-pairs."""
    import __spark_entry__ as em

    df = em.queries()["x_embedding_near_dups"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_add_row_id_multicol_no_persist(spark, sf_dir):
    """Multi-column order keys take the expression fast path: boundaries
    baked as struct literals, so the plan caches nothing O(table)."""
    from data_engineering_capstone_project__spark.operators.relational import (
        add_row_id,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = add_row_id(c, ["c_mktsegment", "c_name"], id_col="rid")
    plan = _physical_plan(out)
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan, plan


def test_top_k_window_prunes_map_side(spark, sf_dir):
    # The probe-selected plan must carry the Partial+Final
    # WindowGroupLimit prune so a low-cardinality group key never
    # funnels the full table through a handful of sort tasks.
    from data_engineering_capstone_project__spark.operators.relational import (
        top_k_per_group,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    out = top_k_per_group(li, ["l_returnflag"], order, k=3)
    plan = _physical_plan(out)
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_write_clustered_narrows_file_ranges(spark, sf_dir, tmp_path):
    """Range-clustered files must each cover a narrow, mostly-disjoint
    slice of the cluster key (parquet footer min/max proves the layout);
    an unclustered write leaves every file spanning ~the full range, so
    min/max stats can prune nothing."""
    import glob

    import pyarrow.parquet as pq

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def file_ranges(path):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("o_orderdate")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    from data_engineering_capstone_project__spark.sources.io import write_clustered

    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(orders, clustered, ["o_orderdate"], n_files=8)
    orders.repartition(8).write.mode("overwrite").parquet(plain)

    cr, pr = file_ranges(clustered), file_ranges(plain)
    lo = min(r[0] for r in cr)
    hi = max(r[1] for r in cr)
    span = (hi - lo).days

    def avg_cover(ranges):
        return sum((b - a).days for a, b in ranges) / len(ranges) / max(span, 1)

    assert avg_cover(pr) > 0.9          # unclustered: every file ~full span
    assert avg_cover(cr) < 0.25         # clustered: narrow slices
    # consecutive clustered files overlap at most at their boundary value
    for (a1, b1), (a2, _b2) in zip(cr, cr[1:]):
        assert a2 >= b1 or (a2 - b1).days >= -1


def test_aqe_splits_skewed_join(spark):
    """The engine's skewed-JOIN story is AQE's OptimizeSkewedJoin (salting
    covers skewed AGGREGATIONS): with a hot key 100x the others, the
    finalized plan must mark the join skew=true and split its reader."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 100_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).unionAll(
            spark.range(0, 1000).select(
                (F.col("id") % 10 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(0, 11).select(F.col("id").alias("k"), F.lit("x").alias("t"))
        j = left.join(right.hint("merge"), "k")
        assert j.count() == 101_000
        j.collect()  # finalize THIS dataframe's adaptive plan
        plan = _physical_plan(j)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark's runtime row-level filtering: a selective dim-side filter
    injects a bloom filter (`bloom_filter_agg` -> `might_contain`) onto the
    fact scan when the join can't broadcast — at 100 TB this is what saves
    a shuffle-heavy SMJ from shuffling fact rows that can never match.
    The thresholds are runtime-settable, so the capability is provable on
    local data."""
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dim = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _physical_plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in keep.items():
            spark.conf.set(k, v)


def test_corpus_sized_joins_never_broadcast(spark, sf_dir):
    """The 500k-doc decade's crash class, pinned in the plan: the
    shingle-array relation (verify_jaccard), the minhash signature
    relation (est filter), and the per-window-hash ownership relation
    (substring_span_dedup) are O(corpus) and carry hint('merge') — a
    post-aggregate size underestimate once picked a ~1.3 GB broadcast
    that exceeded spark.driver.maxResultSize and killed the driver.
    Every join in these plans must be sort-merge, never broadcast-hash."""
    from data_engineering_capstone_project__spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "id_a long, id_b long"
    )
    # the two shingle-array joins (a-side + b-side) are pinned SMJ; the
    # candidate-id SEMI join correctly broadcasts its genuinely-small side
    plan = _physical_plan(dedup.verify_jaccard(docs, pairs))
    assert plan.count("SortMergeJoin") >= 2, plan

    plan = _physical_plan(
        dedup.minhash_lsh_candidates(
            docs, num_hashes=32, bands=8, est_filter=True
        )
    )
    # the two signature-side joins are pinned; the bucket self-join may
    # legitimately pick any equi strategy
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("SortMergeJoin") >= 2, plan

    # substring_span_dedup's ownership pass is a min-struct WINDOW over
    # the hash partition — no corpus-sized owner join exists to mispick a
    # broadcast for (the r4 shape aggregated + joined back and needed the
    # SMJ pin); the remaining joins descend from the winnow kernel's
    # mapInPandas node, whose unknown stats block static broadcast (AQE
    # converts from ACTUAL shuffle sizes, which is safe)
    plan = _physical_plan(dedup.substring_span_dedup(docs))
    assert "windowspecdefinition(wh" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bucketed_fingerprint_index_probe_no_index_shuffle(spark, sf_dir):
    """SCALE.md's incremental-dedup row: 'store corpus fingerprints
    bucketed by fp and the probe needs no corpus-side shuffle'. Write the
    index as a bucketed table; the batch's LEFT ANTI fingerprint probe
    (forced to sort-merge so broadcasting can't mask the layout) must
    shuffle ONLY the batch side — exactly one Exchange in the whole plan,
    and the index feeds the join from its bucketed scan."""
    from data_engineering_capstone_project__spark.operators.text import (
        fingerprint,
    )
    from data_engineering_capstone_project__spark.streaming.stream import (
        corpus_fingerprint_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS fp_idx_b")
    shutil.rmtree(os.path.join(warehouse, "fp_idx_b"), ignore_errors=True)
    write_bucketed(
        corpus_fingerprint_index(corpus), "fp_idx_b", ["fp"], n_buckets=8
    )
    idx = spark.table("fp_idx_b")
    batch = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "_fp", fingerprint(F.col("text"))
    )
    probe = batch.join(
        idx.hint("merge"), batch["_fp"] == idx["fp"], "left_anti"
    )
    plan = _physical_plan(probe)
    assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
    assert plan.count("Exchange") == 1, plan  # the batch side only
    assert "Bucketed: true" in plan and "fp_idx_b" in plan, plan
    # the one Exchange partitions the BATCH's fingerprint, not the index
    ex_line = next(ln for ln in plan.splitlines() if "Exchange" in ln)
    assert "_fp" in ex_line, plan
    # semantics: equals the unbucketed anti-membership probe
    expect = batch.join(
        corpus_fingerprint_index(corpus),
        batch["_fp"] == F.col("fp"),
        "left_anti",
    )
    assert sorted(r["doc_id"] for r in probe.collect()) == sorted(
        r["doc_id"] for r in expect.collect()
    )
