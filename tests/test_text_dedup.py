from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import dedup, text


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The  quick brown fox jumps over the lazy dog"),  # ws/case dup of 1
            (3, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
            (4, "completely different content about spark engines"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_token_count_and_quality(spark):
    df = _docs(spark)
    out = {r["doc_id"]: r for r in text.analyze(df).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[5]["n_tokens"] == 0
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["fingerprint"] != out[3]["fingerprint"]
    assert out[1]["lang_pred"] == "en"


def test_exact_dedup(spark):
    df = _docs(spark)
    out = dedup.exact_dedup(df)
    assert out.count() == 4
    copies = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert copies[1] == 2  # doc 2 collapsed into doc 1


def test_ngram_jaccard_finds_near_dup(spark):
    df = _docs(spark).filter("doc_id != 5")
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got
    assert not any(4 in p for p in got)


def test_minhash_lsh_finds_near_dup(spark):
    df = _docs(spark).filter("doc_id != 5")
    pairs = dedup.minhash_lsh_pairs(df, jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(4 in p for p in got)


def test_chunk_documents(spark):
    toks = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, toks), (2, "a b")], "doc_id long, text string")
    out = text.chunk_documents(df, chunk_tokens=40, overlap=10)  # stride 30
    rows = sorted(
        ((r["doc_id"], r["chunk_id"]), (r["chunk_len"], r["chunk_text"]))
        for r in out.collect()
    )
    by_key = dict(rows)
    # doc 1: starts at 0,30,60 — the window at 60 reaches the end, so no
    # 4th (fully-redundant) chunk is emitted
    assert [k for k in by_key if k[0] == 1] == [(1, 0), (1, 1), (1, 2)]
    assert by_key[(1, 0)][0] == 40
    assert by_key[(1, 0)][1].startswith("w0 w1 ") and by_key[(1, 0)][1].endswith("w39")
    assert by_key[(1, 1)][1].startswith("w30 ")  # overlap of 10
    assert by_key[(1, 2)] == (40, " ".join(f"w{i}" for i in range(60, 100)))
    # short doc: one whole-text chunk
    assert by_key[(2, 0)] == (2, "a b")


def test_train_test_split_stability(spark, sf_dir):
    from data_engineering_capstone_project__spark.operators.relational import (
        train_test_split,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    train, test = train_test_split(c, test_fraction=0.2, id_col="c_custkey")
    n, nt, ns = c.count(), train.count(), test.count()
    assert nt + ns == n
    assert 0 < ns < n
    # hash assignment is stable: same ids land on the same side every run
    _, test2 = train_test_split(c, test_fraction=0.2, id_col="c_custkey")
    assert {r["c_custkey"] for r in test.collect()} == {
        r["c_custkey"] for r in test2.collect()
    }
    # growing the data never flips existing rows
    half = c.filter("c_custkey % 2 = 0")
    _, test_half = train_test_split(half, test_fraction=0.2, id_col="c_custkey")
    full_ids = {r["c_custkey"] for r in test.collect()}
    half_ids = {r["c_custkey"] for r in test_half.collect()}
    assert half_ids == {i for i in full_ids if i % 2 == 0}


def test_contamination_check(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "unrelated words entirely different from everything else here now"),
        ],
        "doc_id long, text string",
    )
    bench = ["ALPHA beta  gamma delta epsilon zeta eta theta"]  # 8 words, case/ws-noisy
    out = {
        r["doc_id"]: (r["n_contaminated_ngrams"], r["contaminated"])
        for r in dedup.contamination_check(docs, bench, ngram_words=8).collect()
    }
    assert out[1][1] and out[1][0] >= 1  # shares the 8-gram after normalization
    assert out[2] == (0, False) and out[3] == (0, False)


def test_word_shingles(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = df.select(dedup.word_shingles(F.col("text"), k=3).alias("sh")).collect()
    assert out[0]["sh"] == ["a b c", "b c d"]


def test_simhash_pairs(spark):
    df = _docs(spark).filter("doc_id != 5")
    fps = dedup.simhash(df)
    assert fps.count() == 4
    pairs = dedup.simhash_pairs(df, max_hamming=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # identical after normalization -> hamming 0
