"""Persist-lifecycle registry: every operator that caches an internal
intermediate must register it, and ``release_intermediates()`` after
consumption must leave ZERO persistent RDDs in the session — the
accumulating-cache hazard VERDICT r4 flagged (long-lived sessions
chaining many dedup stages grew cached relations until LRU eviction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
