import numpy as np
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import similarity
from data_engineering_capstone_project__spark.operators.similarity import (
    kmeans_assign,
    kmeans_fit,
)
from data_engineering_capstone_project__spark.operators.dedup import embedding_near_dups
from data_engineering_capstone_project__spark.sources.io import load_events
from data_engineering_capstone_project__spark.streaming.windows import (
    sessionize,
    tumbling_agg,
)


def test_cosine_topk_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in qrow["embedding"]]
    out = similarity.cosine_topk(emb, q, k=5).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and abs(out[0]["cosine"] - 1.0) < 1e-4
    # numpy oracle
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qv = np.array(q)
    sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    best = ids[np.argsort(-sims)[:5]]
    assert {r["vec_id"] for r in out} == set(best.tolist())


def test_lsh_bucket_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_bucket_pairs(emb, n_planes=6, threshold=0.8).collect()
    }
    assert lsh <= brute
    if brute:
        assert len(lsh) / len(brute) > 0.3  # few planes -> partial recall ok


def _perturbed_corpus(emb):
    """Base vectors + near-duplicate copies (id+100000, first component
    +0.01 → cosine ≈ 0.999), mirroring the entry queries' planted dups."""
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    dup = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    return base.unionByName(dup)


def test_multi_table_lsh_matches_bruteforce(spark, sf_dir):
    """The scale path (multi-table SRP-LSH + exact verify) must return the
    exact brute-force pair set at a near-dup threshold: 6 tables × 6
    planes puts per-pair miss probability at ~3e-7 for cosine ≈ 0.999."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    corpus = _perturbed_corpus(emb)
    brute = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dups(corpus, threshold=0.99).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similarity.lsh_bucket_pairs(
            corpus, n_planes=6, n_tables=6, threshold=0.99
        ).collect()
    }
    assert brute and lsh == brute


def test_lsh_bucket_guard_preserves_recall(spark, sf_dir):
    """With a tiny max_bucket every bucket is sub-bucketed by per-table
    reserve bits; multi-table union must still recover the full planted
    pair set (the guard trades recall only jointly across tables)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    corpus = _perturbed_corpus(emb)
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(corpus, threshold=0.99).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_bucket_pairs(
            corpus, n_planes=6, n_tables=6, threshold=0.99, max_bucket=5
        ).collect()
    }
    assert brute and guarded == brute


def test_auto_lsh_config_scale_safety():
    """Auto config must (a) grow planes with N so expected bucket size
    stays ~target_bucket — the linear-work invariant — and (b) size the
    table count so worst-case pair recall meets the target."""
    import math

    for n in (1_000, 50_000, 500_000, 5_000_000):
        b, L = similarity.auto_lsh_config(n, threshold=0.99)
        assert b == min(24, max(4, math.ceil(math.log2(n / 32))))
        # recall bound at the threshold itself (worst case)
        p = 1.0 - math.acos(0.99) / math.pi
        assert L <= 8 and (1.0 - (1.0 - p**b) ** L >= 0.95 or L == 8)
    # plane count is clamped — degenerate sizes can't explode cost
    assert similarity.auto_lsh_config(0, 0.9) == (4, 1)
    assert similarity.auto_lsh_config(10**12, 0.9)[0] == 24
    # identical-vector threshold needs one table
    assert similarity.auto_lsh_config(10_000, 1.0)[1] == 1


def test_lsh_default_config_recall(spark, sf_dir):
    """The DEFAULT (auto-derived) config — what an untuned user gets —
    must recover ≥ 95% of planted near-dup pairs and every emitted pair
    must be exact-verified at the threshold."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(150)
    corpus = _perturbed_corpus(emb)
    n_planted = emb.count()
    pairs = similarity.lsh_bucket_pairs(corpus, threshold=0.99).collect()
    found = sum(1 for r in pairs if abs(r["id_a"] - r["id_b"]) == 100000)
    assert found / n_planted >= 0.95
    assert all(r["cosine"] >= 0.99 for r in pairs)


def test_ivf_topk_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.kmeans_centroids(emb, n_centroids=4, n_iter=5, sample_rows=200)
    qrow = emb.filter(F.col("vec_id") == 1).collect()[0]
    q = [float(x) for x in qrow["embedding"]]
    out = similarity.ivf_topk(emb, q, cents, k=3, nprobe=2).collect()
    assert len(out) == 3
    assert out[0]["vec_id"] == 1  # query vec itself lives in a probed cell


def test_tumbling_agg_and_sessionize(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    out = tumbling_agg(
        ev, "ts", "10 minutes", ["event_type"], [F.count("*").alias("n")]
    )
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()

    sess = sessionize(ev, "ts", "user_id", gap="30 minutes")
    assert sess.count() == ev.count()
    # session ids are 1..k per user, non-decreasing over time
    one = (
        sess.filter(F.col("user_id") == 1)
        .orderBy("ts")
        .select("session_id")
        .collect()
    )
    vals = [r["session_id"] for r in one]
    assert vals == sorted(vals) and vals[0] == 1


def test_funnel_chain_break(spark):
    """A user whose purchase precedes the click must show NULL at step 3."""
    from data_engineering_capstone_project__spark.streaming.windows import funnel
    from datetime import datetime

    rows = [
        (1, "view", datetime(2024, 1, 1, 10, 0)),
        (1, "click", datetime(2024, 1, 1, 10, 5)),
        (1, "purchase", datetime(2024, 1, 1, 10, 10)),
        (2, "view", datetime(2024, 1, 1, 9, 0)),
        (2, "purchase", datetime(2024, 1, 1, 9, 1)),  # before any click
        (2, "click", datetime(2024, 1, 1, 9, 2)),
        (3, "click", datetime(2024, 1, 1, 8, 0)),  # never viewed
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["user_id"]: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}  # user 3 never entered the funnel
    assert out[1]["step3_ts"] is not None
    assert out[2]["step2_ts"] is not None      # click after view
    assert out[2]["step3_ts"] is None          # no purchase after the click


def test_quantize_embeddings_roundtrip(spark):
    from data_engineering_capstone_project__spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["q"] == [127, -64, 32]  # scale = 1/127
    assert abs(rows[1]["q_scale"] - 1.0 / 127.0) < 1e-12
    assert rows[2]["q_scale"] is None  # zero vector -> NULL scale
    assert rows[2]["q"] is None or all(v is None for v in rows[2]["q"])


def test_embedding_contamination_flags_planted_copies(spark, sf_dir):
    """Near-copies of benchmark vectors are flagged; natural vectors are
    not (synthetic corpus max natural cosine ~= 0.5)."""
    from data_engineering_capstone_project__spark.operators.dedup import (
        embedding_contamination,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bench = emb.filter(F.col("vec_id") < 3).select(as_double.alias("embedding"))
    naturals = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 40)).select(
        "vec_id", as_double.alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double") + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    out = {
        r["vec_id"]: r["contaminated"]
        for r in embedding_contamination(
            naturals.unionByName(planted), bench, threshold=0.99
        ).collect()
    }
    assert all(out[i] for i in (1000, 1001, 1002))
    assert not any(v for k, v in out.items() if k < 1000)


def test_kmeans_fit_recovers_planted_clusters(spark):
    """Three tight, well-separated gaussian blobs: the distributed fit
    must recover the partition exactly, the cost sequence must be
    non-increasing (Lloyd monotonicity), and the whole fit must be
    deterministic run-to-run (seeded hash init — no rand())."""
    import pandas as pd

    rng = np.random.default_rng(7)
    centers = np.array(
        [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]]
    )
    pts = np.vstack([c + rng.normal(0, 0.3, size=(150, 4)) for c in centers])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(pts)),
                "embedding": [list(map(float, p)) for p in pts],
            }
        )
    )
    cents, costs = kmeans_fit(df, k=3, vec_col="embedding", n_iter=6)
    assert all(
        costs[i + 1] <= costs[i] + 1e-9 for i in range(len(costs) - 1)
    ), costs
    # exact recovery: each blob maps to one distinct centroid
    labels = (
        kmeans_assign(df, cents)
        .withColumn("blob", (F.col("vec_id") / 150).cast("int"))
        .groupBy("blob")
        .agg(
            F.countDistinct("cluster").alias("nlab"),
            F.min("cluster").alias("lab"),
        )
        .collect()
    )
    assert all(r["nlab"] == 1 for r in labels)
    assert len({r["lab"] for r in labels}) == 3
    # fitted centroids sit on the planted centers
    got = np.sort(cents.max(1))
    assert np.allclose(cents.max(1), 10.0, atol=0.2), cents
    del got
    c2, costs2 = kmeans_fit(df, k=3, vec_col="embedding", n_iter=6)
    assert np.array_equal(cents, c2)
    assert costs == costs2


def test_kmeans_fit_edge_cases(spark):
    """k=1 degenerates to the global mean; empty input raises; k larger
    than distinct points returns at most n centroids without error."""
    import pandas as pd
    import pytest

    pts = [[0.0, 0.0], [2.0, 0.0], [4.0, 0.0]]
    df = spark.createDataFrame(
        pd.DataFrame({"embedding": [list(p) for p in pts]})
    )
    cents, costs = kmeans_fit(df, k=1, vec_col="embedding", n_iter=3)
    assert np.allclose(cents, [[2.0, 0.0]], atol=1e-9)
    assert abs(costs[-1] - 8.0) < 1e-6  # 4 + 0 + 4
    cents9, _ = kmeans_fit(df, k=9, vec_col="embedding", n_iter=2)
    assert len(cents9) <= 3
    with pytest.raises(ValueError):
        kmeans_fit(df.filter(F.lit(False)), k=2, vec_col="embedding")


def test_semantic_dedup_distributed_fit_matches_sampled(spark):
    """fit='distributed' must find the same planted semantic dup groups
    as the default sampled trainer (both exact-verify returned pairs)."""
    import pandas as pd
    from data_engineering_capstone_project__spark.operators.dedup import (
        semantic_dedup,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 8))
    rows, vid = [], 0
    for v in base:
        rows.append((vid, [float(x) for x in v])); vid += 1
    # planted near-identical copies of the first 5 vectors
    for i in range(5):
        rows.append((1000 + i, [float(x) for x in base[i] + 1e-4]))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    for fit in ("sample", "distributed"):
        kept = {r["vec_id"] for r in
                semantic_dedup(df, threshold=0.999, fit=fit).collect()}
        assert all(1000 + i not in kept for i in range(5)), fit
        assert all(i in kept for i in range(5)), fit


def test_kmeans_fit_layout_independent_and_dim_guard(spark):
    """The fit must agree across partition layouts (candidate set is
    sorted via np.unique; the seeded-hash pick is order-free) up to
    floating-point summation order (~1e-12 — Spark's double sums are
    partition-order-dependent), and mixed-dimension corrupt rows are
    dropped, not crashed on."""
    import pandas as pd

    rng = np.random.default_rng(13)
    pts = rng.normal(size=(80, 4))
    df = spark.createDataFrame(
        pd.DataFrame({"embedding": [list(map(float, p)) for p in pts]})
    )
    c3, k3 = kmeans_fit(df.repartition(3), k=4, vec_col="embedding", n_iter=3)
    c7, k7 = kmeans_fit(df.repartition(7), k=4, vec_col="embedding", n_iter=3)
    assert np.allclose(c3, c7, rtol=0, atol=1e-9)
    assert np.allclose(k3, k7, rtol=1e-12)
    corrupt = df.unionByName(
        spark.createDataFrame(
            pd.DataFrame({"embedding": [[1.0, 2.0]]})  # wrong dim
        )
    )
    cc, _ = kmeans_fit(corrupt.repartition(3), k=4, vec_col="embedding", n_iter=3)
    assert np.allclose(c3, cc, rtol=0, atol=1e-9)  # corrupt row dropped


def test_kmeans_fit_tolerates_ragged_and_null_vectors(spark):
    """Mixed-width / NULL vectors must not crash the per-dimension mean
    update under ANSI mode (ADVICE r5): rows whose width differs from the
    seed vector's dimension are dropped as corrupt, NULL/empty rows are
    filtered, and the fit proceeds on the clean remainder."""
    import pandas as pd

    rows = [[float(i % 3), float(i // 3), 1.0, -1.0] for i in range(30)]
    df = spark.createDataFrame(
        pd.DataFrame({"embedding": rows + [[1.0, 2.0], [0.5], []]})
    )
    df = df.unionByName(
        spark.createDataFrame([(None,)], "embedding array<double>")
    )
    cents, costs = kmeans_fit(df, k=2, vec_col="embedding", n_iter=4)
    assert cents.shape == (2, 4)
    assert all(np.isfinite(cents).ravel())
    assert costs == sorted(costs, reverse=True) or all(
        a >= b - 1e-9 for a, b in zip(costs, costs[1:])
    )
