"""BPE trainer/tokenizer units: hand-computed merge sequences, greedy
rank-order application, and the distributed word-count parity."""

import pandas as pd
from pyspark.sql import functions as F

from data_engineering_capstone_project__spark.operators import bpe


def test_train_merges_hand_computed():
    # Sennrich-style toy: {'hug': 10, 'pug': 5, 'pun': 12, 'bun': 4,
    # 'hugs': 5}. Initial pair counts: ('u','g') 10+5+5=20, ('u','n')
    # 12+4=16, ('h','u') 15, ('p','u') 17, ... so first merge is (u,g).
    wf = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]
    merges = bpe.train_merges_from_counts(wf, 4)
    assert merges[0] == ("u", "g")
    # after (u,g): (u,n)=16 ties (n,'</w>')=16 → lexicographically
    # smaller pair ('n','</w>') wins ('n' < 'u')
    assert merges[1] == ("n", "</w>")
    # then (u,'n</w>') is the unique 16; then (h,ug)=15 ties
    # (ug,'</w>')=15 → ('h','ug') wins
    assert merges[2] == ("u", "n</w>")
    assert merges[3] == ("h", "ug")


def test_train_merges_deterministic_tiebreak():
    # two pairs with equal counts → lexicographically smaller pair wins
    wf = [("ab", 3), ("cd", 3)]
    merges = bpe.train_merges_from_counts(wf, 1)
    assert merges[0] == ("a", "b")


def test_encode_word_greedy_rank_order():
    ranks = {("u", "g"): 0, ("p", "u"): 1, ("n", "</w>"): 2}
    assert bpe._encode_word("pug", ranks) == ["p", "ug", "</w>"]
    assert bpe._encode_word("pun", ranks) == ["pu", "n</w>"]
    assert bpe._encode_word("zzz", ranks) == ["z", "z", "z", "</w>"]
    assert bpe._encode_word("", {}) == ["</w>"]


def test_bpe_end_to_end_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the cat sat on the mat",
                    "the cat ran to the mat",
                    "a cat and the mat",
                ],
            }
        )
    )
    merges = bpe.bpe_train(df, n_merges=10, min_freq=2)
    assert merges  # something merged ('the', 'cat', 'mat' all repeat)
    toks = bpe.bpe_tokenize(df, merges)
    rows = toks.select(
        "text",
        F.concat_ws(
            "",
            F.transform(
                "tokens", lambda t: F.replace(t, F.lit("</w>"), F.lit(""))
            ),
        ).alias("rt"),
    ).collect()
    for r in rows:
        assert r["rt"] == "".join(r["text"].split())
    # fully-merged frequent word becomes a single token
    whole = {m[0] + m[1] for m in merges}
    assert any(t.startswith("the") for t in whole)


def test_word_frequencies_matches_python(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["A a  b", "a B b", None, "  "]})
    )
    got = {
        (r["word"], r["freq"])
        for r in bpe.word_frequencies(df, min_freq=1).collect()
    }
    assert got == {("a", 3), ("b", 3)}


def test_bpe_tokenize_java_normalization_parity(spark):
    """Tokenization must consume EXACTLY the trainer's normalization -
    Java lower/trim/ASCII-whitespace split - on inputs where Python
    semantics diverge: NBSP (U+00A0) and NEL (U+0085) are Unicode
    whitespace for str.split() but NOT for Java's regex \\s (they stay
    inside one word), and the dotted capital I (U+0130) is
    locale-sensitive under lowercasing. The reconstruction below fails
    if the UDF splits or lowercases differently than ``_words``."""
    texts = [
        "\u0130stanbul \u0130STANBUL istanbul",
        "a\u00a0b c\x0bd",      # NBSP glues; vertical tab splits (Java \\s)
        "weird\u2028line\u0085next",  # LS / NEL: Java keeps them in-word
        "\u1e9e STRASSE \u00df",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts * 5}))
    merges = bpe.bpe_train(df, n_merges=25, min_freq=1)
    out = bpe.bpe_tokenize(df, merges)
    rows = out.select(
        F.concat_ws("\x00", bpe._words(F.col("text"))).alias("jw"), "tokens"
    ).collect()
    for r in rows:
        java_words = r["jw"].split("\x00") if r["jw"] else []
        rebuilt, acc = [], ""
        for t in r["tokens"]:
            if t.endswith(bpe.END):
                rebuilt.append(acc + t[: -len(bpe.END)])
                acc = ""
            else:
                acc += t
        assert acc == "", r["tokens"]
        assert rebuilt == java_words, (rebuilt, java_words)


def test_bpe_tokenize_distinct_words_parity(spark, sf_dir):
    """The Zipf-bounded distinct-word path (VERDICT r9 #6) is output-
    identical to the per-batch-cache path, and its below-threshold
    fallback (max_broadcast_words=0 forces it) is too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    merges = bpe.bpe_train(docs, n_merges=40, min_freq=2)
    base = bpe.bpe_tokenize(docs, merges).select("doc_id", "tokens")
    fast = bpe.bpe_tokenize(docs, merges, distinct_words=True).select(
        "doc_id", "tokens"
    )
    fallback = bpe.bpe_tokenize(
        docs, merges, distinct_words=True, max_broadcast_words=0
    ).select("doc_id", "tokens")
    a = {r["doc_id"]: r["tokens"] for r in base.collect()}
    b = {r["doc_id"]: r["tokens"] for r in fast.collect()}
    c = {r["doc_id"]: r["tokens"] for r in fallback.collect()}
    assert a == b == c and len(a) == 300
