from pyspark.sql import functions as F

from _profile import prof

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


def test_connected_components_and_purge(spark):
    """Pairs (1-2, 2-3) and (10-11) -> two clusters; purge keeps min-id
    representative per cluster plus untouched docs."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 7, 10, 11)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_by_clusters(docs, pairs).collect()
    )
    assert kept == [1, 7, 10]


def test_connected_components_long_chain(spark):
    """A path graph 0-1-2-...-9 needs multiple propagation rounds; all
    nodes must still converge to component 0."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(10)}


def test_pack_sequences_budget(spark):
    """Within each stream, any pack except the last must have filled or
    overflowed the budget before the next pack starts (concat-and-chunk)."""
    from data_engineering_capstone_project__spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (20 + 7 * (i % 13)))) for i in range(100)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=100, num_streams=4).collect()
    by_stream: dict = {}
    for r in sorted(out, key=lambda r: (r["stream"], r["doc_id"])):
        by_stream.setdefault(r["stream"], []).append(r)
    for rows in by_stream.values():
        offset = 0
        for r in rows:
            assert r["pack_bin"] == offset // 100
            offset += r["n_tokens"]


def test_pack_sequences_derived_streams(spark):
    """num_streams=None derives stream count from cluster parallelism
    (4× defaultParallelism, floor 32) instead of a fixed constant; an
    explicit count is honored exactly."""
    from data_engineering_capstone_project__spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(200)], "doc_id long, text string"
    )
    derived = max(32, spark.sparkContext.defaultParallelism * 4)
    auto = pack_sequences(docs, budget=100)
    assert auto.agg({"stream": "max"}).collect()[0][0] == min(derived, 200) - 1
    explicit = pack_sequences(docs, budget=100, num_streams=8)
    assert explicit.agg({"stream": "max"}).collect()[0][0] == 7


def test_sample_by_hash_full_fraction(spark):
    """fraction=1.0 must keep every row (the 4-hex threshold can't encode
    0x10000 — regression: it used to keep ~6%); same per-stratum."""
    from data_engineering_capstone_project__spark.operators.relational import (
        sample_by_hash,
        stratified_sample_by_hash,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "k").withColumn(
        "s", (F.col("k") % 2 == 0).cast("string")
    )
    assert sample_by_hash(df, "k", 1.0).count() == 500
    strat = stratified_sample_by_hash(df, "k", "s", {"true": 1.0, "false": 0.0})
    rows = strat.collect()
    assert len(rows) == 250 and all(r["s"] == "true" for r in rows)


def test_ngram_prefix_filter_is_lossless(spark, sf_dir):
    """prefilter='none' candidate generation must return the exact same
    pair set as a full shared-shingle scan (AllPairs completeness)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.8, prefilter="none"
        ).collect()
    }
    # brute-force oracle: all pairs, exact jaccard
    ids = docs.select("doc_id").collect()
    all_pairs = spark.createDataFrame(
        [(a["doc_id"], b["doc_id"]) for a in ids for b in ids if a["doc_id"] < b["doc_id"]],
        "id_a long, id_b long",
    )
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(docs, all_pairs).collect()
        if r["jaccard"] >= 0.8
    }
    assert got == want


def test_auto_minhash_config_scale_safety():
    """Selectivity (rows per band) must grow with N — the candidate-mass
    invariant — while bands keep recall ≥ target at exactly J=t; the
    hash budget is clamped."""
    import math

    t = 0.8
    prev_r = 0
    for n in (500, 5_000, 50_000, 500_000, 50_000_000):
        nh, b = dedup.auto_minhash_config(n, t)
        r = nh // b
        assert nh == r * b and nh <= 256
        assert r >= prev_r  # selectivity never decreases with N
        prev_r = r
        # recall yields before scalability, but never below the floor
        assert 1.0 - (1.0 - t**r) ** b >= 0.5
        if n <= 500_000:
            assert 1.0 - (1.0 - t**r) ** b >= 0.99
        # modeled random-collision mass is bounded (the linearity claim)
        fp = (n * n / 2.0) * b * (0.2**r)
        assert fp <= 20.0 * n
    assert dedup.auto_minhash_config(0, t) == (32, 8)  # degenerate input


def test_ngram_minhash_prefilter_matches_lossless(spark, sf_dir):
    """The default 'minhash' prefilter tier (64 hashes / 16 bands: miss
    ~2e-4 at exactly J=t, lower above it) must emit the same verified
    pair set as the lossless path on a real corpus with planted dups."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    dup = docs.limit(30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dup)
    lossless = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            corpus, threshold=0.8, prefilter="none"
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.8).collect()
    }
    assert lossless and fast == lossless


def test_hash_threshold_and_byte_parse_edges():
    """Pure-Python edges of the ADVICE fixes: thresholds that round to the
    full 0x10000 range clamp to an always-true compare, and Spark size
    conf values parse with any JVM suffix."""
    from data_engineering_capstone_project__spark.operators.relational import (
        _hash_threshold,
        _parse_byte_string,
    )

    assert _hash_threshold(1.0) == "g"
    assert _hash_threshold(0.9999999) == "g"  # rounds to 0x10000 -> clamp
    assert _hash_threshold(0.0) == "0000"
    assert _hash_threshold(0.25) == "4000"
    assert _parse_byte_string("134217728b") == 128 * 1024 * 1024
    assert _parse_byte_string("128MB") == 128 * 1024 * 1024
    assert _parse_byte_string("1g") == 1 << 30
    assert _parse_byte_string("64k") == 64 * 1024
    assert _parse_byte_string("garbage") == 128 * 1024 * 1024  # fallback


def test_sample_by_hash_stability(spark):
    """Sampled key set is identical across re-runs and under data growth,
    and the rate is near the requested fraction."""
    from data_engineering_capstone_project__spark.operators.relational import (
        sample_by_hash,
    )

    small = spark.range(0, 2000).withColumnRenamed("id", "k")
    big = spark.range(0, 4000).withColumnRenamed("id", "k")
    s_small = {r["k"] for r in sample_by_hash(small, "k", 0.3, salt="z").collect()}
    s_big = {r["k"] for r in sample_by_hash(big, "k", 0.3, salt="z").collect()}
    assert s_small == {k for k in s_big if k < 2000}  # growth-stable
    assert 0.25 < len(s_big) / 4000 < 0.35


def test_tf_idf_values(spark):
    """Term in every doc -> idf 0; rarer terms weigh more."""
    from data_engineering_capstone_project__spark.operators.text import tf_idf

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"), (3, "apple date")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["term"]): r for r in tf_idf(docs).collect()}
    assert rows[(1, "apple")]["tf"] == 2
    assert rows[(1, "apple")]["tfidf"] == 0.0  # df=3, n=3 -> ln(1)=0
    assert rows[(2, "cherry")]["tfidf"] > 0


def test_unigram_logprob_values(spark):
    """Hand-computed corpus: T=5, counts a=2 b=2 c=1."""
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.unigram_logprob(docs).collect()}
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 2
    # doc1: (2·ln(2/5) + 1·ln(2/5)) / 3 = ln(0.4)
    assert abs(rows[1]["avg_logprob"] - math.log(0.4)) < 1e-4
    # doc2: (ln(2/5) + ln(1/5)) / 2
    assert abs(rows[2]["avg_logprob"] - (math.log(0.4) + math.log(0.2)) / 2) < 1e-4
    # common-token docs score higher than rare-token docs
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"]


def test_mix_sources_by_tokens(spark, sf_dir):
    from data_engineering_capstone_project__spark.plans.corpus import (
        mix_sources_by_tokens,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    targets = {"src0": 0.5, "src1": 0.5}
    mixed = mix_sources_by_tokens(d, targets)
    rows = {r["source"]: r for r in mixed.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(text.token_count(F.col("text"))).alias("toks"),
    ).collect()}
    # only targeted sources survive
    assert set(rows) <= set(targets)
    # the binding (scarcest-per-share) source keeps all of its rows
    totals = {r["source"]: r["toks"] for r in d.groupBy("source").agg(
        F.sum(text.token_count(F.col("text"))).alias("toks")).collect()}
    binding = min(targets, key=lambda s: totals[s] / targets[s])
    assert rows[binding]["toks"] == totals[binding]
    # deterministic: same rows on re-run
    again = {r["source"]: r["n"] for r in mix_sources_by_tokens(d, targets)
             .groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert {s: r["n"] for s, r in rows.items()} == again
    # bad inputs raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mix_sources_by_tokens(d, {})
    with _pytest.raises(ValueError):
        mix_sources_by_tokens(d, {"no_such_source": 1.0})


def test_strip_boilerplate_lines(spark):
    from data_engineering_capstone_project__spark.operators.text import (
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(i, f"unique line {i}\nSHARED FOOTER") for i in range(10)]
        + [(99, "SHARED FOOTER")],  # all-boilerplate doc
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[0] == "unique line 0"
    assert 99 not in out  # nothing survives for the footer-only doc
    assert all("SHARED FOOTER" not in t for t in out.values())


def test_repetition_score_and_pii(spark):
    from pyspark.sql import functions as F
    from data_engineering_capstone_project__spark.operators.text import (
        mask_pii,
        repetition_score,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all words here are fully distinct tokens"),
            (3, "hi"),
            (4, "write to bob.smith+x@mail.example.org or +1 (555) 123-4567 now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            repetition_score(F.col("text")).alias("rep"),
            mask_pii(F.col("text")).alias("masked"),
        ).collect()
    }
    assert rows[1]["rep"] == 0.75  # 4 identical 3-grams of 4 total -> 1 - 1/4
    assert rows[2]["rep"] == 0.0
    assert rows[3]["rep"] is None  # fewer words than the n-gram size
    assert rows[4]["masked"] == "write to <EMAIL> or <PHONE> now"


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha one\nshared footer\nalpha two"),
            (2, "beta one\nshared footer\nbeta two"),
            (3, "shared footer\nshared footer"),  # all paras seen earlier
            (4, "gamma\n\n  \ngamma"),            # blank paras drop; self-dup drops
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(df).collect()}
    assert out[1]["text"] == "alpha one\nshared footer\nalpha two"
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "beta one\nbeta two"  # footer kept only in doc 1
    assert out[2]["n_dropped"] == 1
    assert 3 not in out  # lost every paragraph
    assert out[4]["text"] == "gamma" and out[4]["n_dropped"] == 1


def test_dedup_against_corpus(spark):
    corpus = spark.createDataFrame(
        [(1, "existing doc one"), (2, "existing doc two")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "brand new doc"),
            (11, "Existing  doc one"),   # normalized dup of corpus doc 1
            (12, "brand new doc"),       # within-batch dup, loses to 10
            (13, "another new doc"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_against_corpus(batch, corpus).collect()
    )
    assert kept == [10, 13]


def test_semantic_dedup_matches_brute_force_purge(spark):
    base = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 + 1).cast("double"),
            (F.col("id") % 11 + 1).cast("double"),
            (F.col("id") % 13 + 1).cast("double"),
        ).alias("embedding"),
    )
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    both = base.unionByName(dup)
    sem = dedup.semantic_dedup(both, n_clusters=4, threshold=0.999)
    brute = dedup.dedup_by_clusters(
        both, dedup.embedding_near_dups(both, threshold=0.999), id_col="vec_id"
    )
    sem_ids = {r["vec_id"] for r in sem.select("vec_id").collect()}
    brute_ids = {r["vec_id"] for r in brute.select("vec_id").collect()}
    # semantic dedup never removes anything brute force keeps (every
    # reported pair is exactness-verified), and its recall on the rows
    # brute force removes stays high — the only misses are dup pairs
    # straddling a k-means cell boundary (the documented SemDeDup trade)
    assert brute_ids <= sem_ids
    all_ids = {r["vec_id"] for r in both.select("vec_id").collect()}
    removed_sem = all_ids - sem_ids
    removed_brute = all_ids - brute_ids
    assert len(removed_sem) >= 0.85 * len(removed_brute)


def test_shingle_explode_plan_is_codegen(spark):
    """The shingle explode must stay a pure-codegen Generate(explode(
    sequence)) + substr — NOT a higher-order-function array build.
    transform() is CodegenFallback (interpreted per element), and an
    expression sibling to a Generate re-evaluates per OUTPUT row: the
    combination measured 14x slower at 50k docs (round 3)."""
    import contextlib
    import io as _io

    from data_engineering_capstone_project__spark.operators.dedup import (
        exploded_char_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "hello world of sparks"), (2, "another document")],
        "doc_id long, text string",
    )
    sh = exploded_char_shingles(docs)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        sh.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" in plan and "explode(sequence" in plan
    assert "transform(" not in plan  # no interpreted HOF in the hot path
    assert "substr" in plan
    # semantics: distinct shingles with per-doc distinct count
    rows = {(r["doc_id"], r["sh"]) for r in sh.collect()}
    szs = {r["doc_id"]: r["_sz"] for r in sh.select("doc_id", "_sz").collect()}
    t1 = "hello world of sparks"
    expect1 = {t1[i : i + 5] for i in range(len(t1) - 4)}
    assert {s for d, s in rows if d == 1} == expect1
    assert szs[1] == len(expect1)


def test_simhash_dense_block_guard_lossless(spark, sf_dir):
    """The max_block second-level pigeonhole must return EXACTLY the same
    pair set as the unguarded join, even when forced onto every group
    (max_block=1) — double pigeonhole is lossless: a pair at distance ≤ d
    matching block i has ≤ d differing remainder bits, so one of the d+1
    remainder sub-blocks matches too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
        prof(40, 80)
    )
    for d in prof((2, 8), (2, 3, 8)):
        plain = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_pairs(docs, max_hamming=d, max_block=None).collect()
        }
        guarded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_pairs(docs, max_hamming=d, max_block=1).collect()
        }
        assert guarded == plain


def test_semantic_dedup_auto_clusters(spark):
    """Default n_clusters=None auto-sizes k from the corpus count (the
    fixed-k default was quadratic: sigma n_c^2 ~ N^2/16); at small N the
    auto value equals the old default so behavior is unchanged."""
    base = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5 + 1).cast("double"),
            (F.col("id") % 3 + 1).cast("double"),
        ).alias("embedding"),
    )
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("embedding")
    )
    out = dedup.semantic_dedup(base.unionByName(dup), threshold=0.9999)
    ids = {r["vec_id"] for r in out.select("vec_id").collect()}
    # identical vectors share a cell (same argmin), so every duplicate
    # group collapses to its min id: the base pattern has period
    # lcm(5,3)=15, and all +1000 copies purge against their originals
    assert ids == set(range(15))


def test_substring_span_dedup_first_occurrence_wins(spark):
    """Cross-doc verbatim repeats >= window are cut from every doc except
    the first occurrence, with exact span edges (stride=1); the owner and
    unrelated docs are untouched; removal covers the maximal common
    context (shared chunk plus any identical surrounding chars)."""
    shared = (
        "the quick brown fox jumps over the lazy dog again and again until "
        "it is extremely bored of jumping over that very patient dog"
    )
    rows = [
        (1, "unique preamble one two three " + shared + " tail of document one"),
        (2, "completely different opening here " + shared + " and a different tail"),
        (3, "no overlap at all in this rather short document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.substring_span_dedup(df, window=50).collect()}
    assert out[1]["n_removed"] == 0            # first occurrence keeps all
    assert out[3]["n_removed"] == 0            # unrelated doc untouched
    assert out[2]["n_removed"] >= len(shared)  # full shared span cut
    assert shared not in out[2]["clean_text"]
    # clean text preserves everything outside the common context
    assert out[2]["clean_text"].startswith("completely different opening")
    assert out[2]["clean_text"].endswith("a different tail")
    # length bookkeeping is exact
    norm2 = " ".join(rows[1][1].split())
    assert len(out[2]["clean_text"]) == len(norm2) - out[2]["n_removed"]


def test_substring_span_dedup_multiple_spans(spark):
    """Two separate repeats in one doc produce two disjoint cut spans."""
    a = "x" * 10 + "A" * 60 + "y" * 30 + "B" * 60 + "z" * 10
    b = "p" * 25 + "A" * 60 + "q" * 40 + "B" * 60 + "r" * 25
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.substring_span_dedup(df, window=50).collect()}
    assert out[1]["n_removed"] == 0
    assert "A" * 60 not in out[2]["clean_text"]
    assert "B" * 60 not in out[2]["clean_text"]
    assert out[2]["clean_text"].count("q") == 40  # middle segment intact


def test_clean_corpus_substring_stage(spark):
    """clean_corpus with substring_dedup=True cuts cross-doc verbatim
    spans from survivors while default config leaves text untouched."""
    from data_engineering_capstone_project__spark.plans.corpus import (
        CorpusConfig,
        clean_corpus,
    )

    shared = (
        "this is a long shared boilerplate sentence that appears verbatim in "
        "both documents and should be removed from the later one entirely"
    )
    rows = [
        (1, "the first document has unique words and then " + shared),
        (2, "a second document with different opening text " + shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CorpusConfig(
        min_quality=0.0, max_repetition=1.0, mask_pii=False,
        test_fraction=0.0, substring_dedup=True,
    )
    train, _, _ = clean_corpus(df, cfg)
    texts = {r["doc_id"]: r["text"] for r in train.collect()}
    assert shared in texts[1]
    assert shared not in texts[2]
    # default config: no substring stage, text unchanged
    train2, _, _ = clean_corpus(
        df, CorpusConfig(min_quality=0.0, max_repetition=1.0,
                         mask_pii=False, test_fraction=0.0)
    )
    assert {r["doc_id"]: r["text"] for r in train2.collect()} == dict(rows)


def test_verify_jaccard_outlier_routing_identical(spark, sf_dir):
    """Pairs forced through the exploded outlier path (max_array_shingles
    low) must produce the exact same jaccard as the array path — including
    mixed pairs (one outlier side, one normal side) and zero-intersection
    pairs, which the inner intersection join drops and the left-join must
    restore as 0.0."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
        prof(24, 40)
    )
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    all_pairs = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(docs, all_pairs).collect()
    }
    # threshold 0: EVERY doc is an outlier → all pairs exploded-path
    got_all_big = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(
            docs, all_pairs, max_array_shingles=0
        ).collect()
    }
    assert got_all_big == want
    # median threshold: mixed routing (outlier-outlier, outlier-normal,
    # normal-normal pairs all present in one run); the routing key is
    # normalized length, so split on the length median
    sizes = sorted(
        r["_len"]
        for r in docs.select(
            F.length(dedup._normalize(F.col("text"))).alias("_len")
        ).collect()
    )
    mid = sizes[len(sizes) // 2]
    got_mixed = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(
            docs, all_pairs, max_array_shingles=mid
        ).collect()
    }
    assert got_mixed == want


def test_verify_jaccard_duplicate_pairs_and_big_path(spark, sf_dir):
    """Duplicate (id_a,id_b) input rows must emit duplicate output rows
    with the SAME jaccard on both routing paths — the exploded outlier
    path once double-counted every shingle match of a duplicated pair."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    pairs_rows = [(a, b) for a in ids for b in ids if a < b]
    dup_pairs = spark.createDataFrame(
        pairs_rows + pairs_rows[:5], "id_a long, id_b long"  # 5 duplicated
    )
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(docs, dup_pairs).collect()
    }
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard(
            docs, dup_pairs, max_array_shingles=0  # all pairs exploded path
        ).collect()
    )
    assert set(got) == want
    assert len(got) == len(pairs_rows) + 5  # duplicates preserved


def test_bpe_tokenize_java_whitespace_semantics(spark):
    """Spark's \\s is ASCII-only: a NBSP-joined 'word' must stay ONE
    token unit in bpe_tokenize, matching the training-side split (a
    Python str.split() would split it and emit out-of-vocab tokens)."""
    import pandas as pd
    from data_engineering_capstone_project__spark.operators import bpe

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["foo bar foo bar baz baz"]})
    )
    words = {r["word"] for r in bpe.word_frequencies(df, min_freq=1).collect()}
    assert "foo bar" in words  # Java \s does not split NBSP
    merges = bpe.bpe_train(df, n_merges=5, min_freq=1)
    toks = bpe.bpe_tokenize(df, merges).collect()[0]["tokens"]
    # roundtrip under the SAME normalization: concat == concat of words
    joined = "".join(t.replace("</w>", "") for t in toks)
    assert joined == "foo barfoo barbazbaz"


# ---------------------------------------------------------------------------
# round 5: two-tier substring dedup (winnowing detect) regression tests
# ---------------------------------------------------------------------------


def test_sliding_min_matches_naive():
    import numpy as np

    from data_engineering_capstone_project__spark.operators.dedup import _sliding_min

    rng = np.random.default_rng(3)
    for n, w in [(1, 1), (5, 3), (26, 26), (100, 7), (257, 26)]:
        h = rng.integers(0, 2**63, size=n, dtype=np.uint64)
        if n < w:
            continue
        got = _sliding_min(h, w)
        want = np.array([h[i : i + w].min() for i in range(n - w + 1)])
        assert (got == want).all(), (n, w)


def test_winnow_runs_detects_misaligned_repeats(spark):
    """The winnowing guarantee is alignment-free: a >=window common
    substring at DIFFERENT offsets (the case positional-stride schemes
    miss) must yield a shared fp whose runs cover both positions."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    assert len(boiler) >= 50
    docs = [
        (0, "x" * 13 + boiler + "y" * 31),
        (1, "z" * 37 + boiler + "w" * 5),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = df.selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\s+', ' ') AS _norm")
    rows = dedup.winnow_runs(base, "doc_id", "_norm", 50).collect()
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fp"], set()).add(r["doc_id"])
    shared = {fp for fp, ds in by_fp.items() if len(ds) == 2}
    assert shared, "misaligned >=50-char repeat produced no shared fingerprint"
    # the duplicated span positions must be covered by shared-fp runs
    for doc_id, off in [(0, 14), (1, 38)]:  # 1-based start of boiler
        covered = any(
            r["s"] <= off <= r["e"]
            for r in rows
            if r["doc_id"] == doc_id and r["fp"] in shared
        )
        assert covered, (doc_id, off)


def test_substring_dedup_winnow_equals_full(spark):
    """Byte-identical equivalence of the two-tier default and the
    single-tier audit path across misaligned repeats, exact dups,
    within-doc repeats, periodic text, multi-byte unicode, short docs."""
    import random

    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "dzeta", "e", "zeta", "h2", "thth", "iota", "kappa"]

    def mkdoc(n):
        return " ".join(rng.choice(words) for _ in range(n))

    boiler = mkdoc(30)
    docs = []
    for i in range(50):
        t = mkdoc(rng.randint(5, 70))
        r = rng.random()
        if r < 0.3:
            pos = rng.randint(0, len(t))
            t = t[:pos] + " " + boiler + " " + t[pos:]
        elif r < 0.4:
            t = t + " " + t
        elif r < 0.5 and docs:
            t = docs[rng.randrange(len(docs))][1]
        elif r < 0.55:
            t = "ab" * rng.randint(30, 100)
        docs.append((i, t))
    docs += [(100, "tiny"), (101, ""), (102, boiler[:49])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for stride in (1, 3):
        full = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in dedup.substring_span_dedup(df, detect="full", stride=stride).collect()
        }
        win = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in dedup.substring_span_dedup(df, detect="winnow", stride=stride).collect()
        }
        assert full == win, stride
    from data_engineering_capstone_project__spark.cachereg import release_intermediates

    release_intermediates()


def test_substring_span_dedup_null_text_rows(spark):
    """NULL text must not crash the winnow detect tier (ADVICE r5:
    _normalize(NULL) is NULL and reached the kernel's .encode) and must
    come out identical to detect='full': the row passes through with NULL
    clean_text while real duplicates around it are still cut."""
    from data_engineering_capstone_project__spark.cachereg import release_intermediates

    boiler = "this exact boilerplate sentence repeats across documents!! " * 2
    docs = [
        (1, boiler + "unique tail one"),
        (2, None),
        (3, boiler + "entirely different ending two"),
        (4, "short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for detect in ("winnow", "full"):
        out = {r["doc_id"]: r for r in dedup.substring_span_dedup(df, detect=detect).collect()}
        release_intermediates()
        assert set(out) == {1, 2, 3, 4}
        assert out[2]["clean_text"] is None and out[2]["n_removed"] is None
        assert out[1]["n_removed"] == 0          # first occurrence owns it
        assert out[3]["n_removed"] > 0           # later occurrence cut
        assert boiler.strip() not in out[3]["clean_text"]
        assert out[4]["n_removed"] == 0
    # winnow_runs itself skips NULL rows rather than crashing
    base = df.select("doc_id", dedup._normalize(F.col("text")).alias("_norm"))
    rows = dedup.winnow_runs(base, "doc_id", "_norm", 50).collect()
    assert {r["doc_id"] for r in rows} <= {1, 3}


def test_mask_pii_extended_classes(spark):
    """Round-6 (VERDICT r5 #6): IPv4/IPv6, SSN-shaped, and payment-card
    masking, with the specific-before-generic chain order (an IP or card
    must never be half-eaten by the greedy phone pattern)."""
    from pyspark.sql import functions as F
    from data_engineering_capstone_project__spark.operators.text import mask_pii

    cases = [
        (1, "server at 192.168.0.1 went down", "server at <IP> went down"),
        (2, "v6 peer fe80::1 and 2001:db8::8a2e:370:7334 up",
            "v6 peer <IP> and <IP> up"),
        (3, "full 2001:0db8:85a3:0000:0000:8a2e:0370:7334 form",
            "full <IP> form"),
        (4, "ssn is 123-45-6789 ok", "ssn is <SSN> ok"),
        (5, "card 4111 1111 1111 1111 on file", "card <CARD> on file"),
        (6, "card 4111-1111-1111-1111 on file", "card <CARD> on file"),
        (7, "pan 4111111111111111 raw", "pan <CARD> raw"),
        (8, "call +1 (555) 123-4567 today", "call <PHONE> today"),
        (9, "mail a.b+c@ex.org now", "mail <EMAIL> now"),
        (10, "meet at 12:30 pm on 3.14 day", "meet at 12:30 pm on 3.14 day"),
        (11, "combo x@y.io 10.0.0.7 123-45-6789 4111 1111 1111 0042 5551234567",
             "combo <EMAIL> <IP> <SSN> <CARD> <PHONE>"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["masked"]
        for r in df.select("doc_id", mask_pii(F.col("text")).alias("masked")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_bigram_logprob_values(spark):
    """Hand-computed bigram model on a tiny corpus; single-token docs
    have no bigrams and disappear."""
    import math

    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.cachereg import release_intermediates

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.bigram_logprob(docs).collect()}
    release_intermediates()
    assert set(rows) == {1, 2}  # doc 3 has no bigrams
    # corpus: c2(a,b)=2 c2(b,a)=1 c2(a,c)=1 c2(b,b)=1; c1(a)=3 c1(b)=2
    d1 = (math.log(2 / 3) + math.log(1 / 3) + math.log(1 / 2)) / 3
    d2 = (math.log(2 / 3) + math.log(1 / 2)) / 2
    assert rows[1]["n_bigrams"] == 3 and rows[2]["n_bigrams"] == 2
    assert abs(rows[1]["avg_logprob"] - d1) < 2e-6
    assert abs(rows[2]["avg_logprob"] - d2) < 2e-6
    # word order matters: same words, scrambled order -> lower score
    ordered = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(10)]
        + [(100, "fox the jumps brown quick")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in text.bigram_logprob(ordered).collect()}
    release_intermediates()
    assert out[100] < out[0]


def test_bm25_topk_frame_queries_match_dict(spark):
    """A DataFrame query set gives the same ranking as the dict form
    (modulo the caller-chosen id), with custom column names supported."""
    from pyspark.sql import functions as F
    from data_engineering_capstone_project__spark.operators import text
    from data_engineering_capstone_project__spark.cachereg import release_intermediates

    docs = [
        (1, "spark shuffle join optimizer"),
        (2, "spark shuffle"),
        (3, "cats and dogs and birds"),
        (4, "shuffle shuffle shuffle shuffle shuffle"),
        (5, "join order and the optimizer"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    want = {
        (r["doc_id"], r["score"], r["rn"])
        for r in text.bm25_topk(df, {"q": "spark shuffle optimizer"}, k=3).collect()
    }
    qdf = spark.createDataFrame(
        [("q", "spark shuffle optimizer")], "qid string, qtext string"
    )
    got = {
        (r["doc_id"], r["score"], r["rn"])
        for r in text.bm25_topk(
            df, qdf, k=3, query_id_col="qid", query_text_col="qtext"
        ).collect()
    }
    assert got == want
    # weights= composes with the frame form too
    w = text.bm25(df)
    got2 = {
        (r["doc_id"], r["score"], r["rn"])
        for r in text.bm25_topk(
            None, qdf, k=3, weights=w, query_id_col="qid", query_text_col="qtext"
        ).collect()
    }
    assert got2 == want
    release_intermediates()


def test_minhash_lsh_join_cross_corpus(spark):
    """Cross-corpus near-dup JOIN: finds A-B edited copies, never emits
    within-side pairs, disambiguates overlapping id spaces, and the
    jaccard values are exact."""
    from data_engineering_capstone_project__spark.cachereg import release_intermediates

    base = "the quick brown fox jumps over the lazy dog near the river bank today "
    a_rows = [
        (1, base * 3),
        (2, "completely different content about spark shuffles and joins " * 3),
        (3, "another unrelated document on parquet footers and row groups " * 3),
        # within-A near-dups — must NOT appear in the cross join output
        (4, base * 3 + "tail"),
    ]
    b_rows = [
        (1, base * 3 + " edited"),       # same id as A's 1 — near-dup of A1/A4
        (7, "totally fresh benchmark question nine"),
        (2, "completely different content about spark shuffles and joins " * 3),  # exact dup of A2
    ]
    da = spark.createDataFrame(a_rows, "doc_id long, text string")
    db = spark.createDataFrame(b_rows, "doc_id long, text string")
    found = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_join(da, db, jaccard_threshold=0.8).collect()
    }
    release_intermediates()
    assert (1, 1) in found and (4, 1) in found and (2, 2) in found
    assert found[(2, 2)] == 1.0
    assert all(0.8 <= j <= 1.0 for j in found.values())
    # no within-side pairs: every key is (A id, B id) and (1,4)-style
    # A-A near-dups are absent (id 4 exists only in A, 7 only in B)
    assert (4, 7) not in found and (1, 4) not in found
    # exact jaccard parity for the edited pair vs a direct set computation
    def shset(df, i):
        row = df.filter(F.col("doc_id") == i).select(
            dedup._normalize(F.col("text")).alias("_n")
        ).select(dedup.shingles_of_norm(F.col("_n"), 5).alias("sh")).first()
        return set(row["sh"])

    sa, sb = shset(da, 1), shset(db, 1)
    want = round(len(sa & sb) / len(sa | sb), 6)
    assert abs(found[(1, 1)] - want) < 1e-9


# ------------------------------------------------------------------ DSIR


def test_hashed_ngram_buckets_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    rows = text.hashed_ngram_buckets(df, n_buckets=64).collect()
    per = {}
    for r in rows:
        per[r["doc_id"]] = per.get(r["doc_id"], 0) + 1
        assert 0 <= r["bucket"] < 64
    # 3 unigrams + 2 bigrams; 1 unigram; blank/null yield nothing
    assert per == {1: 5, 2: 1}


def test_dsir_prefers_target_like_docs(spark):
    tgt_text = "alpha beta gamma delta epsilon zeta " * 5
    junk_text = "uno dos tres cuatro cinco seis " * 5
    target = spark.createDataFrame(
        [(100 + i, tgt_text) for i in range(4)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, tgt_text), (2, tgt_text + "eta theta"), (3, tgt_text),
         (4, junk_text), (5, junk_text), (6, junk_text)],
        "doc_id long, text string",
    )
    lw = {r["doc_id"]: r["logw"] for r in
          text.dsir_log_weights(raw, target, n_buckets=256).collect()}
    assert min(lw[1], lw[2], lw[3]) > max(lw[4], lw[5], lw[6])
    sel = text.dsir_resample(raw, target, k=3, n_buckets=256, gumbel=False)
    assert {r["doc_id"] for r in sel.collect()} == {1, 2, 3}


def test_dsir_table_dense_and_oov_docs_scored(spark):
    """The fitted log-ratio table is dense over the bucket domain, so a
    document whose every gram hashes to a fit-time-unseen bucket is still
    scored (smoothed prior), never silently dropped (ADVICE r7)."""
    target = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "uno dos")], "doc_id long, text string"
    )
    n_buckets = 128
    ratio = text.dsir_fit(raw, target, n_buckets=n_buckets)
    assert ratio.count() == n_buckets  # dense domain
    # an OOV doc: vocabulary disjoint from BOTH fit corpora
    oov = spark.createDataFrame(
        [(7, "zzz qqq www")], "doc_id long, text string"
    )
    scored = text.dsir_score(oov, ratio, n_buckets=n_buckets)
    rows = scored.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7
    assert rows[0]["n_grams"] == 5  # 3 unigrams + 2 bigrams all joined
    # raw-corpus scores are unchanged by densification: populated-bucket
    # ratios are identical, and raw docs only hit populated buckets
    lw = {r["doc_id"]: r["logw"]
          for r in text.dsir_score(raw, ratio, n_buckets=n_buckets).collect()}
    assert lw[1] > lw[2]


def test_dsir_resample_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter(F.col("doc_id") >= 100)
    tgt = docs.filter(F.col("doc_id") < 100)
    a = [tuple(r) for r in text.dsir_resample(
        raw, tgt, k=25, n_buckets=512).select("doc_id", "n_grams").collect()]
    b = [tuple(r) for r in text.dsir_resample(
        raw, tgt, k=25, n_buckets=512).select("doc_id", "n_grams").collect()]
    assert a == b and len(a) == 25
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be >= 1"):
        text.dsir_resample(raw, tgt, k=0)


def test_gopher_rules_boundaries(spark):
    """Each Gopher rule flips on its own planted document; a clean
    natural-language doc keeps; empty text fails every word rule."""
    from data_engineering_capstone_project__spark.operators import text

    good_words = ("the cat and the dog have been to the house of that "
                  "friend with many other animals around here today ") * 5
    docs = [
        (1, good_words),                                # keeps (>=50 words)
        (2, "the cat and that dog have fun with it"),   # <50 words
        (3, "a b c " * 40 + "the of"),                  # mean word len < 3
        (4, ("the## cat## and## dog## have## to## of## that## with## "
             "be## ") * 6),                             # symbol ratio > 0.1
        (5, "\n".join(["- the cat and that dog have to be with it"] * 10)),
        (6, "\n".join(["the cat and that dog have to be of it..."] * 10)),
        (7, ("12345 67890 " * 30) + "the of"),          # alpha ratio < 0.8
        (8, ("zebra quokka lemur gecko panda otter llama bison moose "
             "heron ") * 6),                            # no required stopwords
        (9, ""),                                        # empty
    ]
    out = {
        r["doc_id"]: r
        for r in text.gopher_quality(
            spark.createDataFrame(docs, "doc_id int, text string")
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["r_word_count"] is False and out[2]["keep"] is False
    assert out[3]["r_mean_word_len"] is False
    assert out[4]["r_symbol_ratio"] is False
    assert out[5]["r_bullet_lines"] is False  # 100% bullet lines > 90%
    assert out[6]["r_ellipsis_lines"] is False  # 100% > 30%
    assert out[7]["r_alpha_words"] is False
    assert out[8]["r_stopwords"] is False and out[8]["n_required_stopwords"] == 0
    empty = out[9]
    assert empty["n_words"] == 0 and empty["keep"] is False
    assert empty["r_word_count"] is False and empty["r_mean_word_len"] is False
