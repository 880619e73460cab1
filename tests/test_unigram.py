"""Unigram-LM tokenizer units: hand-checked Viterbi segmentations,
determinism, lossless roundtrip, alphabet coverage, pruning budget, and
the durable-artifact fresh-session parity."""

from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import unigram
from data_engineering_capstone_project__spark.sources import artifacts as art


def test_viterbi_prefers_high_prob_pieces():
    import math

    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5)}
    assert unigram._viterbi("ab", logp, 8) == ["ab"]
    assert unigram._viterbi("aab", logp, 8) == ["a", "ab"]
    # unseen char falls back to a single-char piece (lossless, no error)
    assert unigram._viterbi("axb", logp, 8) == ["a", "x", "b"]


def test_viterbi_tie_prefers_fewer_pieces():
    import math

    # "abab" as ab+ab (2 pieces) vs a+b+a+b (4 pieces) at equal total
    lp = math.log(0.25)
    logp = {"a": lp, "b": lp, "ab": 2 * lp}
    assert unigram._viterbi("abab", logp, 8) == ["ab", "ab"]


def test_train_deterministic_and_budgeted():
    wf = [("hugging", 10), ("hugs", 8), ("hug", 12), ("pug", 5), ("pun", 7)]
    v1 = unigram.train_unigram_from_counts(wf, vocab_size=12)
    v2 = unigram.train_unigram_from_counts(wf, vocab_size=12)
    assert v1 == v2  # bit-stable retrain
    assert len(v1) <= 12 or all(len(p) == 1 for p, _ in v1[12:])
    pieces = {p for p, _ in v1}
    chars = set("".join(w for w, _ in wf))
    assert chars <= pieces  # alphabet coverage survives pruning
    # the dominant shared stem should survive as a multi-char piece
    assert any(len(p) > 1 for p in pieces)


def test_tokenize_lossless_and_cached(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    pieces = unigram.unigram_train(docs, vocab_size=200, n_iter=2)
    toks = unigram.unigram_tokenize(docs, pieces)
    words = unigram._words(F.col("text"))
    bad = toks.filter(
        F.concat_ws("", "tokens") != F.concat_ws("", words)
    ).count()
    assert bad == 0  # lossless segmentation, no sentinel
    # compression: fewer tokens than characters
    agg = toks.select(
        F.size("tokens").alias("nt"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("nc"),
    ).agg(F.sum("nt").alias("t"), F.sum("nc").alias("c")).collect()[0]
    assert agg["t"] < agg["c"]


def test_unigram_model_roundtrip_fresh_session(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    pieces = unigram.unigram_train(docs, vocab_size=150, n_iter=2)
    p = str(tmp_path / "uni")
    art.save_unigram_model(spark, p, pieces)
    fresh = spark.newSession()
    reloaded = art.load_unigram_model(fresh, p)
    assert sorted(reloaded) == sorted(pieces)  # exact IEEE round trip
    a = unigram.unigram_tokenize(docs, pieces).select("doc_id", "tokens")
    fdocs = fresh.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    b = unigram.unigram_tokenize(fdocs, reloaded).select("doc_id", "tokens")
    assert {r["doc_id"]: r["tokens"] for r in a.collect()} == {
        r["doc_id"]: r["tokens"] for r in b.collect()
    }


def test_unigram_distinct_words_parity(spark, sf_dir):
    """The Zipf-bounded distinct-word path is output-identical to the
    per-batch-cache path, including the over-ceiling fallback."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    pieces = unigram.unigram_train(docs, vocab_size=150, n_iter=2)
    a = {
        r["doc_id"]: r["tokens"]
        for r in unigram.unigram_tokenize(docs, pieces).select(
            "doc_id", "tokens"
        ).collect()
    }
    b = {
        r["doc_id"]: r["tokens"]
        for r in unigram.unigram_tokenize(
            docs, pieces, distinct_words=True
        ).select("doc_id", "tokens").collect()
    }
    c = {
        r["doc_id"]: r["tokens"]
        for r in unigram.unigram_tokenize(
            docs, pieces, distinct_words=True, max_broadcast_words=0
        ).select("doc_id", "tokens").collect()
    }
    assert a == b == c and len(a) == 200
