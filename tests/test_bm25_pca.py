"""Round-5 additions: Okapi BM25 weights and distributed one-pass PCA."""

import math

import numpy as np
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import similarity, text
from data_engineering_capstone_project__spark import cachereg


def _bm25_ref(docs, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation (test oracle only)."""
    toks = {i: t.lower().split() for i, t in docs}
    tf = {}
    for i, ws in toks.items():
        for w in ws:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dfreq = {}
    for (_, w), _ in tf.items():
        dfreq[w] = dfreq.get(w, 0) + 1
    n = len(docs)
    dls = {i: len(ws) for i, ws in toks.items() if ws}
    avgdl = sum(dls.values()) / len(dls)
    out = {}
    for (i, w), f in tf.items():
        idf = math.log((n - dfreq[w] + 0.5) / (dfreq[w] + 0.5) + 1.0)
        out[(i, w)] = idf * f * (k1 + 1.0) / (
            f + k1 * (1.0 - b + b * dls[i] / avgdl)
        )
    return out


def test_bm25_matches_reference(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat cat cat dog"),
        (4, "a completely different document entirely"),
        (5, ""),  # counts toward N, contributes no terms
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], r["bm25"])
        for r in text.bm25(df).collect()
    }
    ref = _bm25_ref(docs)
    assert set(got) == set(ref)
    for key, want in ref.items():
        tf, dl, score = got[key]
        assert abs(score - round(want, 6)) < 1e-9, key
    # tf saturation: doc 3's triple 'cat' must score LESS than 3x a single
    one = ref[(1, "cat")]
    assert got[(3, "cat")][2] < 3 * one
    cachereg.release_intermediates()


def test_bm25_length_normalization(spark):
    # same single occurrence of a term: the shorter document scores higher
    docs = [(1, "rare " + "pad " * 50), (2, "rare pad")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {(r["doc_id"], r["term"]): r["bm25"] for r in text.bm25(df).collect()}
    assert got[(2, "rare")] > got[(1, "rare")]
    cachereg.release_intermediates()


def _planted_frame(spark, n=400, dim=6, seed=7):
    rng = np.random.default_rng(seed)
    # variance concentrated along two known orthogonal directions
    d1 = np.zeros(dim); d1[0] = 3.0; d1[1] = 4.0   # |d1| = 5
    d2 = np.zeros(dim); d2[0] = -4.0; d2[1] = 3.0  # |d2| = 5, d1·d2 = 0
    base = np.full(dim, 2.0)
    X = (
        base
        + rng.normal(size=(n, 1)) * (d1 / 5.0) * 10.0
        + rng.normal(size=(n, 1)) * (d2 / 5.0) * 3.0
        + rng.normal(size=(n, dim)) * 0.01
    )
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"),
        X,
        d1 / 5.0,
        d2 / 5.0,
    )


def test_pca_fit_recovers_planted_directions(spark):
    df, X, u1, u2 = _planted_frame(spark)
    comps, eig, mean = similarity.pca_fit(df, k=2)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    # numpy full-covariance oracle
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(eig, w[:2], rtol=1e-9, atol=1e-9)
    # recovered directions align with the planted ones (up to sign)
    assert abs(abs(comps[0] @ u1) - 1.0) < 1e-3
    assert abs(abs(comps[1] @ u2) - 1.0) < 1e-3
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)


def test_pca_layout_independence(spark):
    df, _, _, _ = _planted_frame(spark)
    a = similarity.pca_fit(df.repartition(1), k=3)
    b = similarity.pca_fit(df.repartition(16, "vec_id"), k=3)
    # double summation is partition-order dependent -> allclose, not ==
    assert np.allclose(a[0], b[0], atol=1e-9)
    assert np.allclose(a[1], b[1], atol=1e-9)
    assert np.allclose(a[2], b[2], atol=1e-9)


def test_pca_transform_full_rank_roundtrip(spark):
    df, X, _, _ = _planted_frame(spark, n=100)
    dim = X.shape[1]
    comps, eig, mean = similarity.pca_fit(df, k=dim)
    proj = similarity.pca_transform(df, comps, mean)
    rows = proj.orderBy("vec_id").collect()
    Y = np.array([r["pca"] for r in rows])
    # k = dim: projection is an isometry of the centered data
    assert np.allclose(Y @ comps + mean, X, atol=1e-8)
    # malformed rows are dropped, not corrupted
    bad = spark.createDataFrame(
        [(999, None), (1000, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    out = similarity.pca_transform(df.unionByName(bad), comps, mean)
    assert out.count() == 100


def test_pca_explained_variance_monotone_in_k(spark):
    df, X, _, _ = _planted_frame(spark)
    totals = []
    for k in (1, 2, 4):
        _, eig, _ = similarity.pca_fit(df, k=k)
        assert np.all(np.diff(eig) <= 1e-12)
        totals.append(float(np.sum(eig)))
    assert totals == sorted(totals)
    Xc = X - X.mean(axis=0)
    total_var = float(np.trace(Xc.T @ Xc / len(X)))
    assert totals[-1] <= total_var * (1 + 1e-9)


def test_bm25_topk_ranking(spark):
    docs = [
        (1, "spark shuffle join optimizer"),
        (2, "spark shuffle"),
        (3, "cats and dogs and birds"),
        (4, "shuffle shuffle shuffle shuffle shuffle"),
        (5, "join order and the optimizer"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = text.bm25_topk(df, {"q": "spark shuffle optimizer"}, k=3).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rn"])]
    assert len(ranked) == 3
    assert ranked[0] == 1          # matches all three query terms
    assert 3 not in ranked         # matches none
    # scores strictly ordered under the total order
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rn"])]
    assert scores == sorted(scores, reverse=True)
    # duplicate query terms are counted once
    out2 = text.bm25_topk(df, {"q": "spark spark shuffle optimizer"}, k=3).collect()
    assert {(r["doc_id"], r["score"]) for r in out2} == {
        (r["doc_id"], r["score"]) for r in out
    }
    cachereg.release_intermediates()


def test_euclidean_topk_matches_numpy(spark):
    df, X, _, _ = _planted_frame(spark, n=150)
    q = [float(x) for x in X[42]]
    out = similarity.euclidean_topk(df, q, k=5).collect()
    d = np.linalg.norm(X - np.array(q), axis=1)
    want = np.argsort(d, kind="stable")[:5]
    assert [r["vec_id"] for r in out] == sorted(
        want.tolist(), key=lambda i: (round(d[i], 6), i)
    )
    assert out[0]["vec_id"] == 42 and out[0]["dist"] == 0.0


def test_pca_topk_full_recall_on_low_rank_data(spark):
    """On genuinely low-rank data (the operator's target), filter-and-
    refine with n_components >= rank returns the EXACT top-k: the
    reduced distance is then the true distance, so the candidate set
    provably contains the winners and the rerank emits them in order."""
    df, X, _, _ = _planted_frame(spark, n=300)
    q = [float(x) for x in X[7]]
    exact = [
        (r["vec_id"], r["dist"])
        for r in similarity.euclidean_topk(df, q, k=10).collect()
    ]
    got = [
        (r["vec_id"], r["dist"])
        for r in similarity.pca_topk(
            df, q, k=10, n_components=4, candidate_factor=3
        ).collect()
    ]
    assert got == exact


def test_pca_transform_whitening(spark):
    """Whitened projection has unit variance per output component and
    equals the plain projection scaled by 1/sqrt(eigenvalue)."""
    df, X, _, _ = _planted_frame(spark, n=300)
    comps, eig, mean = similarity.pca_fit(df, k=2)
    plain = {
        r["vec_id"]: r["pca"]
        for r in similarity.pca_transform(df, comps, mean).collect()
    }
    white = {
        r["vec_id"]: r["pca"]
        for r in similarity.pca_transform(df, comps, mean, whiten=eig).collect()
    }
    s = 1.0 / np.sqrt(eig)
    for i, p in plain.items():
        assert np.allclose(np.array(p) * s, white[i], atol=1e-9)
    W = np.array([white[i] for i in sorted(white)])
    assert np.allclose(W.var(axis=0), 1.0, atol=1e-6)
    assert np.allclose(W.mean(axis=0), 0.0, atol=1e-9)


def test_bm25_topk_weights_reuse_and_parity(spark):
    """Round-6 index pattern: a precomputed (persisted) bm25() frame passed
    as ``weights=`` must (a) give the same answers as the convenience path
    and (b) be REUSED — the retrieval plan scans the cache and contains no
    second corpus-tokenization subtree (fit-once/query-many)."""
    docs = [
        (1, "spark shuffle join optimizer"),
        (2, "spark shuffle"),
        (3, "cats and dogs and birds"),
        (4, "shuffle shuffle shuffle shuffle shuffle"),
        (5, "join order and the optimizer"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    w = text.bm25(df).persist()
    w.count()  # materialize the index once
    batches = [{"qa": "spark optimizer"}, {"qb": "join order", "qc": "cats"}]
    try:
        for qs in batches:
            via_weights = text.bm25_topk(None, qs, k=3, weights=w)
            convenience = text.bm25_topk(df, qs, k=3)
            assert sorted(map(tuple, via_weights.collect())) == sorted(
                map(tuple, convenience.collect())
            )
            plan = via_weights._jdf.queryExecution().executedPlan().toString()
            outer = plan.split("InMemoryRelation", 1)[0]
            # reuse: the weights relation is read from cache ...
            assert "InMemoryTableScan" in outer
            # ... and since r11 the dict-query path tokenizes the query
            # frame in ONE tiny local collect job (the corpus's own
            # Spark expression runs there — Java parity preserved), so
            # the FINAL plan carries no tokenization at all outside the
            # cached weights relation: the query side arrives as a
            # pre-resolved local (query_id, term) frame
            assert "trim(" not in outer
            assert "ExistingRDD[query_id" in plan or "LocalTableScan" in plan
    finally:
        w.unpersist()
        cachereg.release_intermediates()


def test_bm25_topk_query_tokenization_java_parity(spark):
    """Query terms must be produced by the CORPUS's tokenization expression
    (Java lower + ASCII-\\s split), not Python str.lower/split — the İ/NBSP
    mismatch class ADVICE r5 flagged. NBSP (U+00A0) is NOT whitespace to
    Java's \\s (stays inside a term) but IS to Python's str.split; \\x0b IS
    whitespace to Java; İ (U+0130) lowercases through the same expression
    on both sides whatever Java does with it."""
    docs = [
        (1, "a b appears here"),      # term 'a\xa0b' (NBSP kept by Java)
        (2, "foo bar baseline"),
        (3, "İstanbul travel notes"),  # İ — locale-sensitive lowering
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    try:
        # NBSP query term matches the NBSP corpus term (Python split would
        # have produced 'a', 'b' — unmatchable)
        out = {r["doc_id"] for r in text.bm25_topk(df, {"q": "a b"}, k=3).collect()}
        assert out == {1}
        # \x0b separates terms on BOTH sides (Java \s includes it)
        out = {r["doc_id"] for r in text.bm25_topk(df, {"q": "foo\x0bbar"}, k=3).collect()}
        assert 2 in out
        # İ: whatever Java lower() yields, query and corpus agree by
        # structural sharing of the expression
        out = {
            r["doc_id"]
            for r in text.bm25_topk(df, {"q": "İstanbul"}, k=3).collect()
        }
        assert out == {3}
        # whitespace-only queries raise (checked via the Spark expression)
        import pytest

        with pytest.raises(ValueError):
            text.bm25_topk(df, {"q": " \t "}, k=3)
        with pytest.raises(ValueError):
            text.bm25_topk(df, {}, k=3)
    finally:
        cachereg.release_intermediates()


def test_pca_topk_auto_candidate_factor(spark):
    """candidate_factor=None derives the candidate budget from the fitted
    explained-variance ratio; on a flat (isotropic) spectrum it must fall
    back to the exact path and return EXACTLY the brute-force answer."""
    import numpy as np

    rng = np.random.default_rng(11)
    X = rng.standard_normal((300, 8))
    iso = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    )
    q = [float(x) for x in X[5]]
    exact = [tuple(r) for r in similarity.euclidean_topk(iso, q, k=10).collect()]
    # ratio ~ 2/8 < 0.3 -> exact fallback, so equality (not just recall)
    got = [
        tuple(r)
        for r in similarity.pca_topk(iso, q, k=10, n_components=2).collect()
    ]
    assert got == exact
    # low-rank corpus: auto sizing keeps the exact answer too (reduced
    # distance is essentially the true distance there)
    df, Y, _, _ = _planted_frame(spark, n=300)
    q2 = [float(x) for x in Y[7]]
    exact2 = [tuple(r) for r in similarity.euclidean_topk(df, q2, k=10).collect()]
    got2 = [
        tuple(r) for r in similarity.pca_topk(df, q2, k=10, n_components=2).collect()
    ]
    assert got2 == exact2
    # the 4-tuple from pca_fit_stats plugs into fitted= (no extra scan path)
    fitted = similarity.pca_fit_stats(df, k=2)
    assert len(fitted) == 4 and fitted[3] > 0
    got3 = [
        tuple(r)
        for r in similarity.pca_topk(
            df, q2, k=10, n_components=2, fitted=fitted
        ).collect()
    ]
    assert got3 == exact2
    # 3-tuple fitted still works (total variance recovered by one agg pass)
    got4 = [
        tuple(r)
        for r in similarity.pca_topk(
            df, q2, k=10, n_components=2, fitted=fitted[:3]
        ).collect()
    ]
    assert got4 == exact2
    # manual override is preserved verbatim
    got5 = [
        tuple(r)
        for r in similarity.pca_topk(
            df, q2, k=10, n_components=4, candidate_factor=3
        ).collect()
    ]
    assert got5 == exact2


def test_euclidean_topk_many_matches_solo(spark):
    import numpy as np

    df, X, _, _ = _planted_frame(spark, n=200)
    qrows = [("qa", [float(x) for x in X[3]]), ("qb", [float(x) for x in X[50]])]
    qf = spark.createDataFrame(qrows, "q_id string, q_vec array<double>")
    got = {}
    for r in similarity.euclidean_topk_many(df, qf, k=7).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["dist"]))
    for qid, qv in qrows:
        solo = similarity.euclidean_topk(df, qv, k=7).collect()
        mine = [x[1:] for x in sorted(got[qid])]
        assert mine == [(r["vec_id"], r["dist"]) for r in solo]


def test_pca_topk_many_exact_on_low_rank_and_iso_fallback(spark):
    import numpy as np

    df, X, _, _ = _planted_frame(spark, n=250)
    qrows = [("qa", [float(x) for x in X[7]]), ("qb", [float(x) for x in X[99]])]
    qf = spark.createDataFrame(qrows, "q_id string, q_vec array<double>")
    fitted = similarity.pca_fit_stats(df, k=2)
    got = sorted(
        map(tuple, similarity.pca_topk_many(
            df, qf, k=8, n_components=2, fitted=fitted
        ).collect())
    )
    want = sorted(
        map(tuple, similarity.euclidean_topk_many(df, qf, k=8).collect())
    )
    assert got == want  # low-rank: reduced ranking is exact end-to-end
    # isotropic corpus -> auto falls back to the exact batch path
    rng = np.random.default_rng(3)
    Y = rng.standard_normal((200, 8))
    iso = spark.createDataFrame(
        [(i, [float(x) for x in Y[i]]) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    qf2 = spark.createDataFrame(
        [("i0", [float(x) for x in Y[11]])], "q_id string, q_vec array<double>"
    )
    got2 = sorted(
        map(tuple, similarity.pca_topk_many(iso, qf2, k=6, n_components=2).collect())
    )
    want2 = sorted(map(tuple, similarity.euclidean_topk_many(iso, qf2, k=6).collect()))
    assert got2 == want2


def test_jl_transform_exact_and_distance_preserving(spark):
    """JL projection: exact numpy parity (the kernel is a matmul),
    linearity, determinism across seeds/frames, and statistical distance
    preservation at the JL-predicted concentration."""
    import numpy as np

    rng = np.random.default_rng(5)
    X = rng.standard_normal((300, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["vec_id"]: np.array(r["jl"])
        for r in similarity.jl_transform(df, 8, seed=11).collect()
    }
    R = np.random.default_rng(11).standard_normal((8, 32)) / np.sqrt(8)
    want = X @ R.T
    for i in range(300):
        # 1e-12 closeness, not bit-equality: BLAS blocking differs by
        # batch M-dimension, shifting last-ulp summation order
        assert np.allclose(out[i], want[i], rtol=0.0, atol=1e-12)
    # same seed on a DIFFERENT frame lands in the same space (the
    # multi-corpus composition property)
    df2 = spark.createDataFrame(
        [(900, [float(x) for x in X[0]])], "vec_id bigint, embedding array<double>"
    )
    other = similarity.jl_transform(df2, 8, seed=11).collect()[0]["jl"]
    assert np.allclose(np.array(other), want[0], rtol=0.0, atol=1e-12)
    # distance concentration: mean squared-distance ratio ~= 1
    d_orig = np.linalg.norm(X[:100] - X[100:200], axis=1)
    J = want
    d_jl = np.linalg.norm(J[:100] - J[100:200], axis=1)
    ratio = (d_jl ** 2 / d_orig ** 2)
    assert 0.85 <= ratio.mean() <= 1.15
    # ragged/NULL rows are dropped, same contract as pca_transform
    bad = spark.createDataFrame(
        [(901, None), (902, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    assert similarity.jl_transform(df.unionByName(bad), 8, seed=11).count() == 300
    import pytest

    with pytest.raises(ValueError):
        similarity.jl_transform(df, 0)


def test_round6_edge_cases(spark):
    """Empty/degenerate inputs take the graceful path: an empty query
    FRAME yields an empty result (no driver-side guard applies — the
    scale path must not run count jobs on query tables); bigram of an
    empty/too-short corpus is empty; euclidean_topk_many with k larger
    than the corpus returns everything ranked."""
    import numpy as np
    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.cachereg import (
        release_intermediates,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id int, text string"
    )
    empty_q = spark.createDataFrame([], "query_id string, text string")
    assert text.bm25_topk(docs, empty_q, k=3).count() == 0
    release_intermediates()
    short = spark.createDataFrame([(1, "solo"), (2, " ")], "doc_id int, text string")
    assert text.bigram_logprob(short).count() == 0
    release_intermediates()
    X = np.arange(12, dtype=float).reshape(3, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(3)],
        "vec_id bigint, embedding array<double>",
    )
    qf = spark.createDataFrame(
        [("q", [0.0, 1.0, 2.0, 3.0])], "q_id string, q_vec array<double>"
    )
    out = similarity.euclidean_topk_many(df, qf, k=10).collect()
    assert len(out) == 3 and [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


def test_rrf_fuse_hand_computed(spark):
    """Two 3-doc rankings, k0=60: fused scores match the hand-computed
    reciprocal-rank sums and a doc present in only one source still
    contributes."""
    from decimal import Decimal

    from data_engineering_capstone_project__spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)],
        "query_id string, doc_id int, rank int",
    )
    b = spark.createDataFrame(
        [("q", 11, 1), ("q", 10, 2), ("q", 99, 3)],
        "query_id string, doc_id int, rank int",
    )
    got = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in rrf_fuse([a, b], k0=60, k=10).collect()
    }
    # contributions are 6-dp-rounded before the decimal sum
    c = lambda r: Decimal(str(round(1.0 / (60 + r), 6)))
    assert got[10][0] == c(1) + c(2)
    assert got[11][0] == c(2) + c(1)
    assert got[12][0] == c(3)
    assert got[99][0] == c(3)
    # 10 and 11 tie exactly (same contribution multiset) -> id-asc tiebreak
    assert got[10][1] == 1 and got[11][1] == 2
    # single-source docs tie at rank 3/4, id asc
    assert got[12][1] == 3 and got[99][1] == 4


def test_rrf_fuse_requires_rankings(spark):
    import pytest as _pytest

    from data_engineering_capstone_project__spark.operators.text import rrf_fuse

    with _pytest.raises(ValueError, match="no rankings"):
        rrf_fuse([])


def test_bm25_bucketed_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """Bucketed BM25 posting layout (VERDICT r10 #7): the persisted
    index is directory-partitioned by a term-hash bucket; a query batch
    (a) pushes its terms' buckets into the scan's PartitionFilters,
    (b) LISTS at most |query-term buckets| of the many bucket
    directories at runtime, and (c) returns results identical to the
    unpruned from-scratch path."""
    from data_engineering_capstone_project__spark.plans.inspect import (
        executed_scan_metrics,
        partition_filters,
    )
    from data_engineering_capstone_project__spark.sources import (
        artifacts as art,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25b")
    art.save_bm25_index(
        text.bm25(docs), p, corpus_digest="t",
        n_term_buckets=text._BM25_TERM_BUCKETS,
    )
    w = art.load_bm25_index(spark, p)
    assert w._bm25_n_term_buckets == text._BM25_TERM_BUCKETS
    queries = {"q1": "hash scan filter", "q2": "stream window watermark"}
    got = text.bm25_topk(None, queries, k=10, weights=w)
    # (a) static partition filter on the bucket column
    assert any("_tb" in f for f in partition_filters(got))
    # (b) runtime listing bound: distinct buckets of the 6 query terms
    qb = (
        spark.createDataFrame(
            [(t,) for q in queries.values() for t in q.split()],
            "term string",
        )
        .select(
            F.pmod(F.xxhash64("term"), F.lit(text._BM25_TERM_BUCKETS))
            .cast("int")
            .alias("_tb")
        )
        .distinct()
        .collect()
    )
    n_qbuckets = len({r["_tb"] for r in qb})
    metrics = executed_scan_metrics(got)
    n_dirs = w.select("_tb").distinct().count()
    assert 0 < metrics.get("numPartitions", 0) <= n_qbuckets < n_dirs
    # (c) identical to the unpruned from-scratch path
    want = text.bm25_topk(docs, queries, k=10, weights=None)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
