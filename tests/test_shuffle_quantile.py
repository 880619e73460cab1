"""deterministic_shuffle + quantile_threshold/filter unit proofs.

Covers the properties the oracle gate can't see: layout independence of
the shuffle order, seed sensitivity, and quantile semantics on hand-built
distributions (including the skew/tie edges)."""

from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators.relational import (
    deterministic_shuffle,
    quantile_filter,
    quantile_threshold,
)


def _positions(df):
    return {r["doc_id"]: r["pos"] for r in df.collect()}


def test_shuffle_layout_independent(spark, sf_dir):
    """The epoch order must not depend on input partitioning — repartition
    the input three wildly different ways and get the identical
    permutation (df.orderBy(rand(seed)) fails this test)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    base = _positions(
        deterministic_shuffle(d, ["doc_id"], seed="s", pos_col="pos")
    )
    for layout in (d.repartition(1), d.repartition(17, "doc_id"), d.coalesce(2)):
        got = _positions(
            deterministic_shuffle(layout, ["doc_id"], seed="s", pos_col="pos")
        )
        assert got == base


def test_shuffle_is_permutation_and_seed_sensitive(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    p1 = _positions(deterministic_shuffle(d, ["doc_id"], seed="ep1", pos_col="pos"))
    assert sorted(p1.values()) == list(range(n))
    p2 = _positions(deterministic_shuffle(d, ["doc_id"], seed="ep2", pos_col="pos"))
    assert p1 != p2  # a new seed re-deals the corpus
    assert sorted(p2.values()) == list(range(n))


def test_shuffle_sorted_output_matches_position_order(spark, sf_dir):
    """pos_col=None returns rows physically sorted by the same order the
    positions describe (toLocalIterator preserves partition order after a
    range partition + sort)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    want = [
        r["doc_id"]
        for r in deterministic_shuffle(d, ["doc_id"], seed="s", pos_col="pos")
        .orderBy("pos")
        .collect()
    ]
    got = [
        r["doc_id"]
        for r in deterministic_shuffle(
            d, ["doc_id"], seed="s", num_partitions=5
        ).toLocalIterator()
    ]
    assert got == want


def test_quantile_threshold_basic(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)], "v double"
    )
    # p=0.5 over 1..10: ceil(0.5*10)=5 rows needed -> threshold 5.0
    assert quantile_threshold(df, "v", 0.5).collect()[0]["threshold"] == 5.0
    # p=1.0 -> the max
    assert quantile_threshold(df, "v", 1.0).collect()[0]["threshold"] == 10.0
    # tiny p -> the min (ceil(0.01*10)=1 row)
    assert quantile_threshold(df, "v", 0.01).collect()[0]["threshold"] == 1.0


def test_quantile_threshold_ties_and_groups(spark):
    rows = [("a", 1.0)] * 6 + [("a", 9.0)] * 4 + [("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    thr = {
        r["g"]: r["threshold"]
        for r in quantile_threshold(df, "v", 0.5, by=["g"]).collect()
    }
    # group a: cum(1.0)=6 >= ceil(0.5*10)=5 -> 1.0 despite the heavy tie
    assert thr == {"a": 1.0, "b": 2.0}


def test_quantile_filter_keeps_top_fraction_per_group(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v)) for v in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    kept = quantile_filter(df, "v", 0.9, by=["g"])
    got = {
        (r["g"], r["v"]) for r in kept.collect()
    }
    # group a: threshold 90 -> keeps 90..100; group b: threshold 9 -> 9,10
    assert got == {("a", float(v)) for v in range(90, 101)} | {
        ("b", 9.0),
        ("b", 10.0),
    }


def test_quantile_filter_global_no_groups(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 21)], "v double")
    kept = sorted(r["v"] for r in quantile_filter(df, "v", 0.75).collect())
    assert kept == [float(v) for v in range(15, 21)]


def test_quantile_threshold_quantization_bounds_state(spark):
    """Values collapsing to the same quantized bucket count as ties — the
    threshold lands on the bucket value, proving the domain is the rounded
    one (bounded state at scale)."""
    df = spark.createDataFrame(
        [(0.12341,), (0.12342,), (0.12349,), (0.9,)], "v double"
    )
    t = quantile_threshold(df, "v", 0.5, precision=4).collect()[0]["threshold"]
    assert t == 0.1234


def test_leakage_safe_split_no_group_straddle(spark, sf_dir):
    """On a corpus with planted duplicates, the fingerprint-keyed split has
    zero groups on both sides, while the row-id-keyed split demonstrably
    leaks (the bug this operator exists to prevent)."""
    from data_engineering_capstone_project__spark.operators.dedup import (
        leakage_safe_split,
    )
    from data_engineering_capstone_project__spark.operators.relational import (
        train_test_split,
    )
    from data_engineering_capstone_project__spark.operators.text import fingerprint

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plant dups: every doc appears twice under a fresh id
    dup = d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = d.select("doc_id", "text").unionByName(dup)
    fp = corpus.select("doc_id", fingerprint(F.col("text")).alias("fp"))

    train, test = leakage_safe_split(fp, "fp", 0.3, salt="s")
    assert train.count() + test.count() == corpus.count()
    straddle = train.select("fp").intersect(test.select("fp"))
    assert straddle.count() == 0

    # row-keyed split on the same corpus leaks fingerprints across sides
    tr2, te2 = train_test_split(fp, 0.3, id_col="doc_id")
    leaked = tr2.select("fp").intersect(te2.select("fp"))
    assert leaked.count() > 0


def test_leakage_safe_split_edges(spark, sf_dir):
    from data_engineering_capstone_project__spark.operators.dedup import (
        leakage_safe_split,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    tr, te = leakage_safe_split(d, "doc_id", 0.0)
    assert (tr.count(), te.count()) == (n, 0)
    tr, te = leakage_safe_split(d, "doc_id", 1.0)
    assert (tr.count(), te.count()) == (0, n)


def test_upsample_sources_epoch_counts(spark, sf_dir):
    """floor(e) copies for everyone + the fractional extra only for the
    deterministic hash sample; epoch indices contiguous from 0; zero-epoch
    sources disappear."""
    from data_engineering_capstone_project__spark.plans.corpus import (
        upsample_sources,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    up = upsample_sources(
        d, {"src0": 2.5, "src1": 0.0}, default_epochs=1.0, salt="t"
    )
    per_doc = {
        (r["doc_id"], r["epoch"]) for r in up.collect()
    }
    docs = {r["doc_id"]: r["source"] for r in d.collect()}
    import hashlib

    for doc, src in docs.items():
        copies = sorted(e for (dd, e) in per_doc if dd == doc)
        h = hashlib.md5(f"{doc}|t".encode()).hexdigest()[:4]
        if src == "src0":
            want = 3 if h < "8000" else 2
        elif src == "src1":
            want = 0
        else:
            want = 1
        assert copies == list(range(want)), (doc, src, copies)


def test_upsample_sources_deterministic_across_layouts(spark, sf_dir):
    from data_engineering_capstone_project__spark.plans.corpus import (
        upsample_sources,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    a = sorted(
        map(tuple, upsample_sources(d, {"src3": 1.5}, salt="x").collect())
    )
    b = sorted(
        map(
            tuple,
            upsample_sources(
                d.repartition(13), {"src3": 1.5}, salt="x"
            ).collect(),
        )
    )
    assert a == b


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quantile_filter_plan_broadcasts_thresholds(spark, sf_dir):
    """The threshold join-back must be a broadcast (one row per group) and
    never a nested-loop product; the big side stays in place."""
    from data_engineering_capstone_project__spark.operators.relational import (
        quantile_filter,
    )
    from data_engineering_capstone_project__spark.operators.text import (
        quality_score,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select("doc_id", "lang", quality_score(F.col("text")).alias("q"))
    plan = _physical_plan(quantile_filter(scored, "q", 0.5, by=["lang"]))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_deterministic_shuffle_plan_no_single_partition_sort(spark, sf_dir):
    """Global training order must come from a range partition, never a
    1-partition global sort."""
    from data_engineering_capstone_project__spark.operators.relational import (
        deterministic_shuffle,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    plan = _physical_plan(deterministic_shuffle(d, ["doc_id"], seed="s"))
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan
