"""Batched IVF retrieval, incremental index append, and snapshot CDC."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import similarity
from data_engineering_capstone_project__spark.sources.io import (
    snapshot_diff,
    write_versioned,
)


def _base(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def test_ivf_topk_many_matches_solo(spark, sf_dir):
    """The batched probe must agree with N independent ivf_topk calls —
    same centroids, same nprobe, same ordering."""
    base = _base(spark, sf_dir)
    cents = similarity.kmeans_centroids(base, n_centroids=8, n_iter=5, sample_rows=300)
    qrows = base.filter(F.col("vec_id").isin(1, 2, 5)).collect()
    qdf = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows],
        "q_id bigint, q_vec array<double>",
    )
    many = similarity.ivf_topk_many(base, qdf, cents, k=7, nprobe=3)
    got = {}
    for r in many.collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for r in qrows:
        solo = similarity.ivf_topk(
            base, [float(x) for x in r["embedding"]], cents, k=7, nprobe=3
        ).collect()
        expect = [(i + 1, s["vec_id"], s["cosine"]) for i, s in enumerate(solo)]
        assert sorted(got[r["vec_id"]]) == expect


def test_ivf_topk_many_stored_cells_prune(spark, sf_dir, tmp_path):
    """With a stored cell column the batched probe pushes the probed-cell
    union as a partition filter and returns identical results."""
    from data_engineering_capstone_project__spark.plans.inspect import (
        partition_filters,
    )

    base = _base(spark, sf_dir)
    cents = similarity.kmeans_centroids(base, n_centroids=8, n_iter=5, sample_rows=300)
    path = str(tmp_path / "corp")
    similarity.write_ivf_corpus(base, path, cents)
    corpus = spark.read.parquet(path)
    qdf = spark.createDataFrame(
        [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in base.filter(F.col("vec_id").isin(1, 2)).collect()
        ],
        "q_id bigint, q_vec array<double>",
    )
    pruned = similarity.ivf_topk_many(
        corpus, qdf, cents, k=5, nprobe=2, cell_col="ivf_cell"
    )
    assert any("ivf_cell" in f for f in partition_filters(pruned))
    plain = similarity.ivf_topk_many(base, qdf, cents, k=5, nprobe=2)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_append_ivf_corpus_visible_and_partitioned(spark, sf_dir, tmp_path):
    base = _base(spark, sf_dir)
    cents = similarity.kmeans_centroids(base, n_centroids=8, n_iter=5, sample_rows=300)
    path = str(tmp_path / "corp2")
    similarity.write_ivf_corpus(base, path, cents)
    n0 = spark.read.parquet(path).count()
    q = [float(x) for x in base.filter(F.col("vec_id") == 1).first()["embedding"]]
    newbie = spark.createDataFrame(
        [(999001, [q[0] + 0.01, *q[1:]])], "vec_id bigint, embedding array<double>"
    )
    similarity.append_ivf_corpus(newbie, path, cents)
    corpus = spark.read.parquet(path)
    assert corpus.count() == n0 + 1
    # the appended row landed in the SAME cell the codebook assigns it
    expect_cell = int(
        np.argmin(((cents - np.asarray([q[0] + 0.01, *q[1:]])[None, :]) ** 2).sum(1))
    )
    got_cell = corpus.filter(F.col("vec_id") == 999001).first()["ivf_cell"]
    assert got_cell == expect_cell
    top = similarity.ivf_topk_pruned(corpus, q, cents, k=10, nprobe=4).collect()
    assert 999001 in [r["vec_id"] for r in top[:2]]


def test_snapshot_diff_inserts_deletes_updates(spark, tmp_path):
    p = str(tmp_path / "snap")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], "id int, v string"
    )
    write_versioned(df1, p)
    # v2: row 2 updated, one copy of the duplicated row 3 dropped, row 4 new
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "id int, v string"
    )
    write_versioned(df2, p)
    got = sorted(
        (r["id"], r["v"], r["_change"]) for r in snapshot_diff(spark, p, 1, 2).collect()
    )
    assert got == [
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),  # multiset: ONE of the two copies
        (4, "d", "insert"),
    ]
    # default v_new = committed LATEST
    assert sorted(
        (r["id"], r["v"], r["_change"]) for r in snapshot_diff(spark, p, 1).collect()
    ) == got
    # self-diff is empty
    assert snapshot_diff(spark, p, 2, 2).count() == 0


def test_pq_encode_and_ivf_pq_topk(spark, sf_dir, tmp_path):
    """IVF-PQ (VERDICT r10 #4): codes are m in-range byte ids per row,
    a planted near-duplicate of the query ranks first through the full
    prune→approx→rerank path, the rerank's cosines are EXACT (equal to
    brute force on the same ids), and the codebook artifact round-trips
    bit-identically."""
    from data_engineering_capstone_project__spark.sources import (
        artifacts as art,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qrow = base.filter(F.col("vec_id") == 7).collect()[0]
    q = [float(x) for x in qrow["embedding"]]
    near = [x + 0.001 for x in q]
    planted = base.unionByName(
        spark.createDataFrame([(999001, near)], base.schema)
    )
    m, ksub = 8, 64
    cents = similarity.kmeans_centroids(
        planted, n_centroids=8, n_iter=5, sample_rows=500
    )
    books = similarity.pq_fit(planted, m=m, ksub=ksub, sample_rows=500)
    enc = similarity.pq_encode(planted, books).withColumn(
        "ivf_cell", similarity.assign_ivf_cell(F.col("embedding"), cents)
    )
    # code well-formedness
    assert (
        enc.filter(
            (F.size("pq_code") != m)
            | F.exists("pq_code", lambda c: (c < 0) | (c >= ksub))
        ).count()
        == 0
    )
    top = similarity.ivf_pq_topk(
        enc, q, cents, books, k=10, nprobe=4, n_candidates=64
    ).collect()
    ids = [r["vec_id"] for r in top]
    assert 999001 in ids[:2] and 7 in ids[:2]
    # rerank cosines are exact: brute-force on the same ids agrees
    brute = {
        r["vec_id"]: r["cosine"]
        for r in similarity.cosine_topk(planted, q, k=2000).collect()
    }
    for r in top:
        assert r["cosine"] == brute[r["vec_id"]]
    # codebook artifact round-trip
    p = str(tmp_path / "books")
    art.save_pq_codebooks(spark, p, books, corpus_digest="t")
    loaded = art.load_pq_codebooks(spark, p)
    assert loaded.shape == (m, ksub, 64 // m)
    assert (loaded == books).all()
